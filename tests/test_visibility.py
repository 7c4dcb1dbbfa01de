"""Visibility filter truth table ported from VisibilityEvaluatorTest.scala
plus the Spark-side broadcast-semi-join filter."""

import pytest

from geomesa_spark.plans.visibility import (VisibilityParseError, can_see,
                                            parse_visibility,
                                            visibility_filter)

USER, ADMIN, TEST = "user", "admin", "test"


def test_evaluate_truth_table():
    # VisibilityEvaluatorTest.scala:92-118, verbatim
    for auths in ({USER, ADMIN, TEST}, {USER}, {ADMIN, TEST}, set()):
        assert can_see(None, auths)
        assert can_see("", auths)
    assert can_see("user", {USER, ADMIN, TEST})
    assert can_see("user", {USER})
    assert not can_see("user", {ADMIN, TEST})
    assert not can_see("user", set())
    assert can_see("user&admin&test", {USER, ADMIN, TEST})
    assert not can_see("user&admin&test", {USER, ADMIN})
    assert not can_see("user&admin&test", {TEST})
    assert not can_see("user&admin&test", set())
    assert can_see("user|admin|test", {USER, ADMIN, TEST})
    assert can_see("user|admin|test", {USER, ADMIN})
    assert can_see("user|admin|test", {TEST})
    assert not can_see("user|admin|test", set())
    assert can_see("(user&admin)|test", {USER, ADMIN, TEST})
    assert can_see("(user&admin)|test", {TEST})
    assert can_see("(user&admin)|test", {USER, ADMIN})
    assert not can_see("(user&admin)|test", {ADMIN})
    assert not can_see("(user&admin)|test", set())


def test_operator_precedence():
    # & binds tighter than |: user|admin&test == user|(admin&test)
    assert can_see("user|admin&test", {USER})
    assert can_see("user|admin&test", {ADMIN, TEST})
    assert not can_see("user|admin&test", {ADMIN})
    # user&admin|test == (user&admin)|test
    assert can_see("user&admin|test", {TEST})
    assert not can_see("user&admin|test", {USER})


def test_special_chars_and_quotes():
    for ch in "_-:./":
        assert can_see(f"x{ch}x", {f"x{ch}x"})
    assert can_see('"weird label!"', {"weird label!"})
    assert can_see("zZ9", {"zZ9"})


def test_invalid_expressions_raise():
    for bad in (" ", "&", "|", "user&admin&", "user&&admin", "(user",
                "user)", "user|"):
        with pytest.raises(VisibilityParseError):
            parse_visibility(bad)


def test_spark_visibility_filter(spark):
    rows = [
        (1, "user"), (2, "admin"), (3, "user&admin"), (4, "(user&admin)|test"),
        (5, None), (6, ""), (7, "secret"),
    ]
    df = spark.createDataFrame(rows, "id long, visibility string")
    got = {r.id for r in visibility_filter(df, {"user", "test"}).collect()}
    # user: yes; admin: no; user&admin: no; (user&admin)|test: yes (test);
    # null/empty: yes; secret: no
    assert got == {1, 4, 5, 6}
    assert {r.id for r in visibility_filter(df, set()).collect()} == {5, 6}
