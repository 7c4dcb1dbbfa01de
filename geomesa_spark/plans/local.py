"""Local (in-memory, pandas) ECQL evaluation — the LocalQueryRunner analog.

The reference runs filters two ways: pushed down through index scans, and
naively on the client (planning/LocalQueryRunner.scala:70-103); its FilterTest
asserts both agree (filter/FilterTest.scala:92-103). This module is our naive
side: evaluate an ECQL string row-by-row over a pandas frame with parsed
geometry objects. Used as the oracle for the corpus parity tests and as a
driver-side fallback for small in-memory layers (e.g. the streaming cache).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from geomesa_spark.geom import algos, model
from geomesa_spark.geom.wkb import wkb_loads
from geomesa_spark.plans.ecql import _ISO, _to_degrees, _tokenize, SPATIAL_OPS


class LocalEcql:
    """Evaluate ECQL over a pandas frame -> boolean numpy mask."""

    def __init__(self, text: str, pdf: pd.DataFrame, geom_col: str = "geom",
                 fid_col: str = "__fid__"):
        self.tokens = _tokenize(text)
        self.pos = 0
        self.pdf = pdf
        self.n = len(pdf)
        self.fid_col = fid_col
        self.geoms = [wkb_loads(bytes(b)) if b is not None else None
                      for b in pdf[geom_col]] if geom_col in pdf.columns else None

    # token plumbing (same shapes as the Catalyst compiler)
    def peek(self):
        return self.tokens[self.pos]

    def next(self):
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    def expect(self, kind, value=None):
        k, v = self.next()
        assert k == kind and (value is None or v.upper() == value), (k, v)
        return v

    def _peek_word(self):
        k, v = self.peek()
        return v.upper() if k == "word" else None

    def eval(self) -> np.ndarray:
        m = self.or_expr()
        assert self.peek()[0] == "eof"
        return m

    def or_expr(self):
        left = self.and_expr()
        while self._peek_word() == "OR":
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self):
        left = self.not_expr()
        while self._peek_word() == "AND":
            self.next()
            left = left & self.not_expr()
        return left

    def not_expr(self):
        if self._peek_word() == "NOT":
            self.next()
            return ~self.not_expr()
        if self.peek()[0] == "lparen":
            self.next()
            m = self.or_expr()
            self.expect("rparen")
            return m
        return self.predicate()

    def predicate(self):
        k, v = self.peek()
        if k == "word" and v.upper() in SPATIAL_OPS:
            return self.spatial()
        if k == "word" and v.upper() == "IN":
            return self.in_list(self.fid_col)
        if k == "word" and v.upper() in ("INCLUDE", "EXCLUDE"):
            self.next()
            return np.full(self.n, v.upper() == "INCLUDE")
        prop = self.expect("word")
        w = self._peek_word()
        col = self.pdf[prop] if prop in self.pdf.columns else pd.Series([None] * self.n)
        if w == "DURING":
            self.next()
            lo = pd.Timestamp(self.expect("iso").rstrip("Z"))
            self.expect("slash")
            hi = pd.Timestamp(self.expect("iso").rstrip("Z"))
            c = pd.to_datetime(col)
            return ((c > lo) & (c < hi)).to_numpy()
        if w in ("BEFORE", "AFTER"):
            self.next()
            t = pd.Timestamp(self.expect("iso").rstrip("Z"))
            c = pd.to_datetime(col)
            return ((c < t) if w == "BEFORE" else (c > t)).to_numpy()
        if w == "TEQUALS":
            self.next()
            t = pd.Timestamp(self.expect("iso").rstrip("Z"))
            return (pd.to_datetime(col) == t).to_numpy()
        if w == "NOT":
            self.next()
            w2 = self._peek_word()
            if w2 == "BETWEEN":
                return ~self._between(col)
            if w2 in ("LIKE", "ILIKE"):
                return ~self._like(col)
            if w2 == "IN":
                return ~self.in_list(prop)
            raise ValueError(w2)
        if w == "BETWEEN":
            return self._between(col)
        if w in ("LIKE", "ILIKE"):
            return self._like(col)
        if w == "IN":
            return self.in_list(prop)
        if w == "IS":
            self.next()
            neg = self._peek_word() == "NOT"
            if neg:
                self.next()
            self.expect("word", "NULL")
            isnull = col.isna().to_numpy()
            return ~isnull if neg else isnull
        k2, op = self.next()
        assert k2 == "op", op
        lit = self.literal()
        if isinstance(lit, str) and _ISO.match(lit):
            c = pd.to_datetime(col)
            lit = pd.Timestamp(lit.rstrip("Z"))
        else:
            c = col
        m = {"=": c == lit, "<>": c != lit, "<": c < lit,
             "<=": c <= lit, ">": c > lit, ">=": c >= lit}[op]
        return m.fillna(False).to_numpy()

    def _between(self, col):
        self.expect("word", "BETWEEN")
        lo = self.literal()
        self.expect("word", "AND")
        hi = self.literal()
        if isinstance(lo, str) and _ISO.match(str(lo)):
            c = pd.to_datetime(col)
            lo, hi = pd.Timestamp(lo.rstrip("Z")), pd.Timestamp(str(hi).rstrip("Z"))
        else:
            c = col
        return ((c >= lo) & (c <= hi)).fillna(False).to_numpy()

    def _like(self, col):
        ci = self.expect("word").upper() == "ILIKE"
        pat = str(self.literal())
        rx = "^" + re.escape(pat).replace("%", ".*").replace("_", ".") + "$"
        # re.escape escapes % and _ as \% \_ in some versions; normalize
        rx = rx.replace(r"\%", ".*").replace(r"\_", ".")
        flags = re.I if ci else 0
        return col.astype(str).str.match(rx, flags).fillna(False).to_numpy()

    def in_list(self, prop):
        self.expect("word", "IN")
        self.expect("lparen")
        vals = [self.literal()]
        while self.peek()[0] == "comma":
            self.next()
            vals.append(self.literal())
        self.expect("rparen")
        col = self.pdf[prop] if prop in self.pdf.columns else pd.Series([None] * self.n)
        return col.isin(vals).to_numpy()

    def literal(self):
        k, v = self.next()
        if k == "string":
            return v[1:-1].replace("''", "'")
        if k == "number":
            f = float(v)
            return int(f) if f.is_integer() and "." not in v else f
        if k in ("iso", "word"):
            return v
        raise ValueError((k, v))

    # spatial
    def spatial(self):
        op = self.expect("word").upper()
        self.expect("lparen")
        self.expect("word")  # property (single geometry column assumed)
        self.expect("comma")
        if op == "BBOX":
            nums = [self.literal()]
            for _ in range(3):
                self.expect("comma")
                nums.append(self.literal())
            self.expect("rparen")
            q = model.box(*[float(x) for x in nums])
            return self._apply(lambda g: algos.intersects(g, q))
        q = self._geometry()
        if op in ("DWITHIN", "BEYOND"):
            self.expect("comma")
            dist = float(self.literal())
            self.expect("comma")
            units = self.expect("word").lower()
            self.expect("rparen")
            deg = _to_degrees(dist, units, q)
            m = self._apply(lambda g: algos.distance(g, q) <= deg)
            return m if op == "DWITHIN" else ~m
        self.expect("rparen")
        fns = {"INTERSECTS": lambda g: algos.intersects(g, q),
               "DISJOINT": lambda g: not algos.intersects(g, q),
               "CONTAINS": lambda g: algos.contains(g, q),
               "WITHIN": lambda g: algos.contains(q, g),
               "OVERLAPS": lambda g: algos.overlaps(g, q),
               "CROSSES": lambda g: algos.crosses(g, q),
               "TOUCHES": lambda g: algos.touches(g, q),
               "EQUALS": lambda g: algos.geom_equals(g, q)}
        return self._apply(fns[op])

    def _geometry(self):
        from geomesa_spark.geom import wkt as wktmod
        typ = self.expect("word").upper()
        depth = 0
        parts = [typ]
        while True:
            k, v = self.next()
            if k == "lparen":
                depth += 1
                parts.append("(")
            elif k == "rparen":
                depth -= 1
                parts.append(")")
                if depth == 0:
                    break
            elif k == "comma":
                parts.append(",")
            else:
                parts.append(" " + v)
        return wktmod.wkt_loads("".join(parts))

    def _apply(self, fn):
        return np.array([bool(fn(g)) if g is not None else False for g in self.geoms])


def local_filter(text: str, pdf: pd.DataFrame, **kw) -> pd.DataFrame:
    """Rows of ``pdf`` matching the ECQL filter (brute force)."""
    return pdf[LocalEcql(text, pdf, **kw).eval()]
