"""Plan-contract lint: no explicit ``broadcast()`` of corpus-derived frames.

The bug class (r5 verdict #1): an explicit broadcast hint OVERRIDES the
planner's size check, so a frame whose cardinality scales with the corpus
(one row per document / order / event) ships to every executor and OOMs the
driver at production scale — silently, because every small-SF test passes.
``q_winnow_containment`` shipped exactly this shape for one round: a
``fps.groupBy("doc_id")`` sizes table behind ``F.broadcast`` (~50k rows at
sf0.1, billions at 100 TB).

The lint walks the ANALYZED logical plan (hints are still explicit there —
the optimizer folds them into join strategies) of every registry query.
For each ``ResolvedHint (strategy=broadcast)`` it scans the hint's subtree
top-down and flags the hint unless every path to a leaf is BOUNDED before
it reaches an unbounded source:

- Unbounded sources: ``Relation`` leaves whose column signature identifies a
  fact table (lineitem / orders / events / documents / embeddings — tables
  that grow with the corpus), and ``LogicalRDD`` leaves (localCheckpoint
  products: checkpointing erases lineage, so a checkpointed corpus
  derivative must be bounded AFTER the checkpoint to be broadcastable).
- Bounding nodes: ``Aggregate`` / ``Deduplicate`` whose every key is bounded
  (a global aggregate, or keys like ``source`` / dates / enum-ish flags —
  anything EXCEPT per-entity ids: ``doc_id``, ``*_orderkey``, ``*_custkey``,
  ``user_id``, fingerprints/hashes, raw ``word`` vocab keys), and
  ``GlobalLimit`` (an explicit top-k is bounded by construction).

Dim tables (customer / part / supplier / nation / region) are broadcastable
by design — the star-join strategy the plan tests pin. At a true 100 TB SF
customer/part/supplier would be config-shifted to shuffled joins, but that
is a sizing knob, not a correctness-of-plan issue; the lint's target is
frames with CORPUS cardinality behind a FORCED broadcast.

Queries with a justified hit carry an entry in ``ALLOWED`` with the reason;
the test fails on any unlisted hit, so a new risky broadcast cannot land
silently.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

# Column signatures that identify a fact-table scan in an analyzed-plan
# Relation leaf (cols print as name#id, so match on the bare name).
_FACT_SIGNATURES = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "embedding",
}

# Grouping keys that do NOT bound an aggregate: one group per corpus entity
# (ids, join keys, content hashes/fingerprints, raw vocab words).
_UNBOUNDED_KEY = re.compile(
    r"(doc_id|event_id|user_id|tweet_id|orderkey|custkey|partkey|suppkey"
    r"|^s$"  # the repo's conventional shingle column — content-cardinality
    r"|(^|_)(id|key|hash|fp|h|sig|word|token|term|shingle)$)")


def _key_name(expr: str) -> str:
    """'cast(doc_id#12L as string)' -> 'doc_id'; 'source#3' -> 'source'."""
    names = re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", expr)
    return names[-1] if names else expr.strip()


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _grouping_keys(line: str) -> list[str]:
    """Aggregate [k1, k2], [aggs] / Deduplicate [k1, k2] -> key names."""
    m = (re.match(r"Aggregate \[(.*?)\], \[", line)
         or re.match(r"Deduplicate \[(.*?)\]", line))
    if m is None:
        return []
    body = m.group(1)
    if not body.strip():
        return []
    return [_key_name(g) for g in _split_top_level(body)]


def _node(line: str) -> tuple[int, str]:
    """(indent, text) — indent is the column where the node name starts."""
    text = line.lstrip(" :|+-")
    return len(line) - len(text), text


@dataclass
class BroadcastViolation:
    hint_line: str
    leaf_line: str

    def __str__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.hint_line}  ->  {self.leaf_line}"


def _subtree(lines: list[tuple[int, str]], i: int) -> list[tuple[int, str]]:
    indent = lines[i][0]
    j = i + 1
    while j < len(lines) and lines[j][0] > indent:
        j += 1
    return lines[i + 1:j]


def _is_bounding(text: str) -> bool:
    if text.startswith("GlobalLimit"):
        return True
    if text.startswith("Aggregate ") or text.startswith("Deduplicate "):
        keys = _grouping_keys(text)
        return all(not _UNBOUNDED_KEY.search(k) for k in keys)
    return False


def _unbounded_leaf(text: str) -> bool:
    if text.startswith("LogicalRDD"):
        return True
    if text.startswith("Relation"):
        cols = set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", text))
        return any(sig in cols for sig in _FACT_SIGNATURES.values())
    return False


def broadcast_violations(df: DataFrame) -> list[BroadcastViolation]:
    """Every broadcast hint in df's analyzed plan whose subtree reaches a
    fact-table scan or a checkpointed RDD without passing a bounding node."""
    plan = str(df._jdf.queryExecution().analyzed())
    lines = [_node(ln) for ln in plan.splitlines() if ln.strip()]
    out: list[BroadcastViolation] = []
    for i, (_, text) in enumerate(lines):
        if not (text.startswith("ResolvedHint")
                and "broadcast" in text.lower()):
            continue
        sub = _subtree(lines, i)
        # Walk the subtree; prune everything under a bounding node.
        k, pruned_below = 0, None
        while k < len(sub):
            indent, t = sub[k]
            if pruned_below is not None and indent > pruned_below:
                k += 1
                continue
            pruned_below = None
            if _is_bounding(t):
                pruned_below = indent
            elif _unbounded_leaf(t):
                out.append(BroadcastViolation(text.strip(), t.strip()))
                break
            k += 1
    return out
