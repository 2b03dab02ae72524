"""JSONPath-subset addressing and nested JSON rewrite.

Mirrors the reference's JSONPath support (JsonPathUtil.java:19-77,
JsonVisitor.java:65-140):

* supported: ``$.a.b[0].c``, bracket notation ``$['a']['b'][0]['c']``,
  array wildcard ``[*]`` (a concrete index falls back to the ``[*]``
  config if present — JsonVisitor.java:99-103);
* rejected at config time: deep scan ``..``, filter predicates
  ``[?(...)]``, slices, multi-index, functions;
* only string/long/double leaves are rewritten (JsonCaster.java:46-110);
  timestamp targets inside JSON are forbidden
  (TimestampFormatFilterPlugin.java:118-120);
* untargeted siblings are preserved unchanged.

Execution: JSON columns are opaque strings; the rewrite runs inside a
pandas UDF — decode once per row, but every configured path's values are
collected across the whole Arrow batch and cast VECTORIZED (numpy), then
written back (the per-row part is only tree navigation, like the
reference's visitor; the strptime/strftime math is batch-vectorized).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from .cast import CastPlan

WILDCARD = "*"


class JsonPathError(ValueError):
    pass


_IDENT_RE = re.compile(r"[^.\[\]]+")


def parse_jsonpath(path: str) -> tuple:
    """Compile a JSONPath to a tuple of steps (str key | int index | '*').

    Raises JsonPathError for the unsupported constructs the reference
    rejects (JsonPathUtil.java:52-77).
    """
    if not path.startswith("$"):
        raise JsonPathError(f"JSONPath must start with '$': {path!r}")
    if ".." in path:
        raise JsonPathError(f"deep scan '..' is not supported: {path!r}")
    if "[?" in path:
        raise JsonPathError(f"filter predicates are not supported: {path!r}")
    steps: list = []
    i = 1
    n = len(path)
    while i < n:
        c = path[i]
        if c == ".":
            i += 1
            m = _IDENT_RE.match(path, i)
            if not m:
                raise JsonPathError(f"empty property at {i} in {path!r}")
            name = m.group(0)
            if name.endswith("()"):
                raise JsonPathError(f"functions are not supported: {path!r}")
            steps.append(name)
            i = m.end()
        elif c == "[":
            j = path.find("]", i)
            if j < 0:
                raise JsonPathError(f"unclosed '[' in {path!r}")
            inner = path[i + 1 : j].strip()
            if inner == "*":
                steps.append(WILDCARD)
            elif inner.startswith(("'", '"')) and inner.endswith(("'", '"')):
                steps.append(inner[1:-1])
            elif ":" in inner:
                raise JsonPathError(f"slices are not supported: {path!r}")
            elif "," in inner:
                raise JsonPathError(f"multi-index is not supported: {path!r}")
            else:
                try:
                    steps.append(int(inner))
                except ValueError:
                    raise JsonPathError(f"bad bracket content {inner!r} in {path!r}") from None
            i = j + 1
        else:
            raise JsonPathError(f"unexpected char {c!r} at {i} in {path!r}")
    if not steps or not isinstance(steps[0], str) or steps[0] == WILDCARD:
        raise JsonPathError(f"JSONPath must start with a property: {path!r}")
    return tuple(steps)


def is_jsonpath(name: str) -> bool:
    return name.startswith("$.") or name.startswith("$[")


def root_column(path: str) -> str:
    """Top-level column a JSONPath addresses (JsonPathUtil.getColumnName)."""
    return str(parse_jsonpath(path)[0])


class JsonRewritePlan:
    """All configured rewrites under one root JSON column.

    ``targets``: list of (jsonpath-string, CastPlan) — CastPlan.source_type
    is resolved at runtime per leaf value (JsonCaster dispatches on the
    msgpack value type; we dispatch on the decoded python type).
    """

    def __init__(self, targets: list[tuple[str, CastPlan]]):
        self.targets = [(parse_jsonpath(p)[1:], plan) for p, plan in targets]
        # exact-path lookup; wildcard handled by fallback during walk
        self._by_path: dict[tuple, CastPlan] = {tuple(steps): plan for steps, plan in self.targets}

    # -- batch rewrite ---------------------------------------------------

    def rewrite_series(self, s: pd.Series) -> pd.Series:
        decoded = [None] * len(s)
        vals = s.to_numpy(dtype=object)
        for i, v in enumerate(vals):
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            try:
                decoded[i] = json.loads(v)
            except (TypeError, ValueError):
                decoded[i] = None

        # phase 1: collect leaf values per configured cast plan
        hits: list[tuple[int, object, object, object, CastPlan]] = []
        # (row, container, key, raw_value, plan)
        for i, tree in enumerate(decoded):
            if tree is None:
                continue
            self._walk(tree, (), hits, i)

        # phase 2: vectorized cast per plan, grouped by runtime source type
        by_plan: dict[int, list[int]] = {}
        for idx, (_, _, _, _, plan) in enumerate(hits):
            by_plan.setdefault(id(plan), []).append(idx)
        results: dict[int, object] = {}
        for _, idxs in by_plan.items():
            plan = hits[idxs[0]][4]
            raws = [hits[k][3] for k in idxs]
            for src_type, mask in _type_masks(raws):
                sel = [k for k, m in zip(idxs, mask) if m]
                if not sel:
                    continue
                sub = pd.Series([hits[k][3] for k in sel], dtype=object)
                cp = CastPlan(
                    src_type,
                    plan.target_type,
                    parser=plan.parser,
                    formatter=plan.formatter,
                    from_unit=plan.from_unit,
                    to_unit=plan.to_unit,
                )
                out = cp.apply_np(_coerce_series(sub, src_type))
                for k, val in zip(sel, out.tolist()):
                    results[k] = None if val is pd.NA or (isinstance(val, float) and np.isnan(val)) else val

        # phase 3: write back and re-encode. Hits that were never cast
        # (runtime type outside long/double/string, e.g. boolean or null —
        # no phase-2 mask selected them) keep their original leaf value,
        # mirroring JsonCaster.java:46-110 which returns non-castable
        # values unchanged; only an ATTEMPTED cast may produce null.
        for k, (row, container, key, _, _) in enumerate(hits):
            if k not in results:
                continue
            val = results[k]
            if isinstance(val, np.integer):
                val = int(val)
            elif isinstance(val, np.floating):
                val = float(val)
            container[key] = val

        out = [
            json.dumps(t, separators=(",", ":"), ensure_ascii=False) if t is not None else None
            for t in decoded
        ]
        return pd.Series(out, index=s.index, dtype="string")

    def _walk(self, node, path: tuple, hits: list, row: int):
        if isinstance(node, dict):
            for key, val in node.items():
                p = path + (key,)
                if isinstance(val, (dict, list)):
                    if self._on_path(p):
                        self._walk(val, p, hits, row)
                else:
                    plan = self._lookup(p)
                    if plan is not None:
                        hits.append((row, node, key, val, plan))
        elif isinstance(node, list):
            for idx, val in enumerate(node):
                p = path + (idx,)
                if isinstance(val, (dict, list)):
                    if self._on_path(p) or self._on_path(path + (WILDCARD,)):
                        self._walk(val, p, hits, row)
                else:
                    plan = self._lookup(p)
                    if plan is not None:
                        hits.append((row, node, idx, val, plan))

    def _lookup(self, path: tuple) -> "CastPlan | None":
        plan = self._by_path.get(path)
        if plan is not None:
            return plan
        # concrete index → [*] fallback (JsonVisitor.java:99-103)
        if path and isinstance(path[-1], int):
            return self._by_path.get(path[:-1] + (WILDCARD,))
        for i, st in enumerate(path):
            if isinstance(st, int):
                alt = path[:i] + (WILDCARD,) + path[i + 1 :]
                plan = self._by_path.get(alt)
                if plan is not None:
                    return plan
        return None

    def _on_path(self, path: tuple) -> bool:
        """Prefix pruning (JsonVisitor.buildShouldVisitSet:65-87)."""
        for steps, _ in self.targets:
            if len(steps) > len(path):
                ok = True
                for a, b in zip(steps[: len(path)], path):
                    if a == WILDCARD and isinstance(b, int):
                        continue
                    if a != b:
                        ok = False
                        break
                if ok:
                    return True
        return False


def _type_masks(raws: list):
    """Partition raw JSON leaves by runtime type (JsonCaster dispatch)."""
    long_mask = [isinstance(v, bool) is False and isinstance(v, int) for v in raws]
    dbl_mask = [isinstance(v, float) for v in raws]
    str_mask = [isinstance(v, str) for v in raws]
    return [("long", long_mask), ("double", dbl_mask), ("string", str_mask)]


def _coerce_series(s: pd.Series, src_type: str) -> pd.Series:
    if src_type == "long":
        return s.astype("int64")
    if src_type == "double":
        return s.astype("float64")
    return s.astype("string")
