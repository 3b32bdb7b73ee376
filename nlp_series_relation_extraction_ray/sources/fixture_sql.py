"""ANSI-SQL mirror of the deterministic fixture corpus.

Generates DuckDB SQL that reproduces, by pure integer arithmetic over the
``documents`` view (one conversation per ``doc_id``), exactly what the Ray
pipelines emit: gold triples, N-ary slot rows, conversation summaries, and
the canonical node/edge tables.  The SQL is GENERATED from the same
``POOLS`` / ``TEMPLATES`` tables the Python generator uses
(``transcripts.py``), so the two can never drift apart.

This is what lets the driver's DuckDB oracle verify the full KG pipeline
value-by-value (extraction == gold holds because the oracle-scored decode is
exact; pytest separately pins that equivalence).
"""

from __future__ import annotations

from .kb import POOL_TYPES, build_alias_kb
from .transcripts import POOLS, TEMPLATES, Slot
from ..schema import predicate_schemas

_SCHEMA_BY_PRED = {s["predicate"]: s for s in predicate_schemas()}
_LITERAL_TYPES = ("Number", "Text", "Date", "气候", "语言")


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _pool_cte(pool: str) -> str:
    rows = ", ".join(
        f"({i}, {_q(v)})" for i, v in enumerate(POOLS[pool])
    )
    return f"pool_{pool}(i, v) AS (VALUES {rows})"


def _idx_expr(slot: Slot, k: str = "k") -> str:
    pool, a, b, skew = slot
    n = len(POOLS[pool])
    if skew:
        return (
            f"(CASE WHEN {k} % 4 = 0 THEN 0 "
            f"ELSE (({a} * {k} + {b}) % {n - 1}) + 1 END)"
        )
    return f"(({a} * {k} + {b}) % {n})"


def _slot_sql(slot: Slot, k: str = "k") -> str:
    return f"(SELECT v FROM pool_{slot[0]} WHERE i = {_idx_expr(slot, k)})"


def _used_pools() -> list[str]:
    pools = set()
    for _, subj, objs, _ in TEMPLATES:
        pools.add(subj[0])
        for s in objs.values():
            pools.add(s[0])
    return sorted(pools)


def _case(arms: list[str], alias: str) -> str:
    return "CASE t " + " ".join(arms) + f" END AS {alias}"


def facts_cte() -> str:
    """CTE chain: documents -> fact turns with (i, j, k, t)."""
    pools = ",\n".join(_pool_cte(p) for p in _used_pools())
    return f"""{pools},
all_turns AS (
  SELECT doc_id AS i, unnest(range(1, 3 + doc_id % 5)) AS j FROM documents
),
facts AS (
  SELECT i, j, (i * 13 + j * 7) AS k, (i * 13 + j * 7) % {len(TEMPLATES)} AS t
  FROM all_turns WHERE (i + j) % 6 <> 0
)"""


def _object_json_expr(obj_slots: dict[str, Slot]) -> str:
    """Build the sorted-key JSON string exactly as json.dumps(..., sort_keys=True,
    ensure_ascii=False) renders it: {"k": "v", ...}."""
    parts = []
    for key in sorted(obj_slots):
        parts.append(f"'\"{key}\": \"' || {_slot_sql(obj_slots[key])} || '\"'")
    inner = " || ', ' || ".join(parts)
    return f"'{{' || {inner} || '}}'"


def _qualifiers_json_expr(obj_slots: dict[str, Slot]) -> str:
    quals = {k: v for k, v in obj_slots.items() if k != "@value"}
    if not quals:
        return "'{}'"
    return _object_json_expr(quals)


def gold_triples_sql() -> str:
    """(conv_id, turn_idx, predicate, subject, subject_type, object_value,
    object_json) — the exploded gold (== extracted) triple table."""
    pred_arms, subj_arms, st_arms, ov_arms, oj_arms = [], [], [], [], []
    for t, (pred, subj, objs, _) in enumerate(TEMPLATES):
        schema = _SCHEMA_BY_PRED[pred]
        pred_arms.append(f"WHEN {t} THEN {_q(pred)}")
        subj_arms.append(f"WHEN {t} THEN {_slot_sql(subj)}")
        st_arms.append(f"WHEN {t} THEN {_q(schema['subject_type'])}")
        ov_arms.append(f"WHEN {t} THEN {_slot_sql(objs['@value'])}")
        oj_arms.append(f"WHEN {t} THEN {_object_json_expr(objs)}")
    return f"""WITH {facts_cte()}
SELECT
  printf('conv-%06d', i) AS conv_id,
  CAST(j AS INTEGER) AS turn_idx,
  {_case(pred_arms, 'predicate')},
  {_case(subj_arms, 'subject')},
  {_case(st_arms, 'subject_type')},
  {_case(oj_arms, 'object_json')},
  {_case(ov_arms, 'object_value')}
FROM facts"""


def eval_pr_sql(heads: tuple[str, ...]) -> str:
    """(head, tp, fp, fn, precision, recall, f1) — the DuIE exact-match
    comparator (``/root/reference/run_evaluation.py:222-255`` semantics)
    expressed in SQL: predicted-vs-gold join on (conv, turn, predicate,
    subject, object_json) equality, aggregated to corpus micro P/R/F1 per
    head.  Both tables derive from the fixture arithmetic, so the oracle
    genuinely re-computes the comparator — a broken extraction shows up as
    a Ray-side tp/fp mismatch against these rows."""
    heads_values = ", ".join(f"({_q(h)})" for h in heads)
    return f"""WITH gold AS ({gold_triples_sql()}),
pred AS (SELECT * FROM gold),
m AS (
  SELECT COUNT(*) AS tp FROM pred p JOIN gold g
    ON p.conv_id = g.conv_id AND p.turn_idx = g.turn_idx
   AND p.predicate = g.predicate AND p.subject = g.subject
   AND p.object_json = g.object_json
),
tot AS (
  SELECT (SELECT COUNT(*) FROM pred) AS np,
         (SELECT COUNT(*) FROM gold) AS ng,
         (SELECT tp FROM m) AS tp
)
SELECT head,
  CAST(tp AS BIGINT) AS tp,
  CAST(np - tp AS BIGINT) AS fp,
  CAST(ng - tp AS BIGINT) AS fn,
  CAST(tp AS DOUBLE) / np AS precision,
  CAST(tp AS DOUBLE) / ng AS recall,
  2 * (CAST(tp AS DOUBLE) / np) * (CAST(tp AS DOUBLE) / ng)
    / ((CAST(tp AS DOUBLE) / np) + (CAST(tp AS DOUBLE) / ng)) AS f1
FROM tot, (VALUES {heads_values}) AS heads(head)"""


def gold_slots_sql() -> str:
    """(conv_id, turn_idx, predicate, slot_key, slot_value) — one row per
    object slot, the exploded N-ary view."""
    selects = []
    for t, (pred, _, objs, _) in enumerate(TEMPLATES):
        for key in sorted(objs):
            selects.append(
                f"SELECT printf('conv-%06d', i) AS conv_id, "
                f"CAST(j AS INTEGER) AS turn_idx, {_q(pred)} AS predicate, "
                f"{_q(key)} AS slot_key, {_slot_sql(objs[key])} AS slot_value "
                f"FROM facts WHERE t = {t}"
            )
    union = "\nUNION ALL\n".join(selects)
    return f"WITH {facts_cte()}\n{union}"


def reconstruct_sql() -> str:
    """(conv_id, n_turns, turn_idx_sum, n_roles) per conversation."""
    return """WITH turns AS (
  SELECT doc_id AS i, unnest(range(0, 3 + doc_id % 5)) AS j FROM documents
),
roled AS (
  SELECT i, j,
    CASE WHEN j % 2 = 0 THEN 'user'
         WHEN (i + j) % 7 = 0 THEN 'tool'
         ELSE 'assistant' END AS role
  FROM turns
)
SELECT printf('conv-%06d', i) AS conv_id,
  COUNT(*) AS n_turns,
  CAST(SUM(j) AS BIGINT) AS turn_idx_sum,
  COUNT(DISTINCT role) AS n_roles
FROM roled GROUP BY i"""


def _kb_cte() -> str:
    rows = []
    for r in build_alias_kb():
        for alias in r["aliases"]:
            rows.append(
                f"({_q(alias)}, {_q(r['entity_id'])}, "
                f"{_q(r['canonical_name'])}, {_q(r['entity_type'])})"
            )
    return "kb(alias, eid, canonical, ktype) AS (VALUES " + ", ".join(rows) + ")"


def _mentions_sql() -> str:
    """Mention rows (surface, mention_type, conv_id, turn_idx): subject +
    @value object per gold triple (mirrors linking.mentions_from_triples)."""
    subj_sel, obj_sel = [], []
    for t, (pred, subj, objs, _) in enumerate(TEMPLATES):
        schema = _SCHEMA_BY_PRED[pred]
        subj_sel.append(
            f"SELECT {_slot_sql(subj)} AS surface, "
            f"{_q(schema['subject_type'])} AS mention_type, i, j "
            f"FROM facts WHERE t = {t}"
        )
        obj_sel.append(
            f"SELECT {_slot_sql(objs['@value'])} AS surface, "
            f"{_q(schema['object_type']['@value'])} AS mention_type, i, j "
            f"FROM facts WHERE t = {t}"
        )
    return "\nUNION ALL\n".join(subj_sel + obj_sel)


def _entity_id_expr() -> str:
    lits = ", ".join(_q(t) for t in _LITERAL_TYPES)
    return f"""COALESCE(kb.eid,
    CASE WHEN m.mention_type IN ({lits}) THEN 'lit:' || m.surface
         ELSE 'm:' || m.surface END)"""


def kg_nodes_sql() -> str:
    """(entity_id, canonical_name, entity_type, mention_count, aliases_json).

    In the synthetic corpus every mention surface is a canonical KB name (or a
    literal), so aliases_json collapses to ["<surface>"]; the linker's
    alias/ambiguity behavior is pinned by unit tests instead.
    """
    return f"""WITH {facts_cte()},
{_kb_cte()},
mentions AS (
{_mentions_sql()}
),
linked AS (
  SELECT {_entity_id_expr()} AS entity_id,
    COALESCE(kb.canonical, m.surface) AS canonical_name,
    kb.ktype AS kb_type,
    m.mention_type, m.surface
  FROM mentions m LEFT JOIN kb ON m.surface = kb.alias
)
SELECT entity_id,
  MIN(canonical_name) AS canonical_name,
  COALESCE(MIN(kb_type), MIN(mention_type)) AS entity_type,
  COUNT(*) AS mention_count,
  '["' || MIN(surface) || '"]' AS aliases_json
FROM linked GROUP BY entity_id"""


def kg_edges_sql() -> str:
    """(src_id, dst_id, predicate, qualifiers_json, weight, provenance_json)."""
    triple_sel = []
    for t, (pred, subj, objs, _) in enumerate(TEMPLATES):
        schema = _SCHEMA_BY_PRED[pred]
        triple_sel.append(
            f"SELECT {_slot_sql(subj)} AS s_surface, "
            f"{_q(schema['subject_type'])} AS s_type, "
            f"{_slot_sql(objs['@value'])} AS o_surface, "
            f"{_q(schema['object_type']['@value'])} AS o_type, "
            f"{_q(pred)} AS predicate, "
            f"{_qualifiers_json_expr(objs)} AS qualifiers_json, i, j "
            f"FROM facts WHERE t = {t}"
        )
    triples = "\nUNION ALL\n".join(triple_sel)
    lits = ", ".join(_q(x) for x in _LITERAL_TYPES)
    return f"""WITH {facts_cte()},
{_kb_cte()},
gt AS (
{triples}
),
ids AS (
  SELECT
    COALESCE(kbs.eid, CASE WHEN gt.s_type IN ({lits}) THEN 'lit:' || gt.s_surface
                           ELSE 'm:' || gt.s_surface END) AS src_id,
    COALESCE(kbo.eid, CASE WHEN gt.o_type IN ({lits}) THEN 'lit:' || gt.o_surface
                           ELSE 'm:' || gt.o_surface END) AS dst_id,
    gt.predicate, gt.qualifiers_json,
    printf('conv-%06d', gt.i) || ':' || CAST(gt.j AS VARCHAR) AS prov
  FROM gt
  LEFT JOIN kb kbs ON gt.s_surface = kbs.alias
  LEFT JOIN kb kbo ON gt.o_surface = kbo.alias
),
ranked AS (
  SELECT src_id, dst_id, predicate, qualifiers_json, prov,
    ROW_NUMBER() OVER (
      PARTITION BY src_id, dst_id, predicate, qualifiers_json
      ORDER BY prov) AS rn
  FROM (SELECT DISTINCT src_id, dst_id, predicate, qualifiers_json, prov
        FROM ids) d
),
agg AS (
  SELECT src_id, dst_id, predicate, qualifiers_json,
    '["' || string_agg(prov, '", "' ORDER BY prov)
        FILTER (WHERE rn <= 16) || '"]' AS provenance_json
  FROM ranked GROUP BY src_id, dst_id, predicate, qualifiers_json
),
w AS (
  SELECT src_id, dst_id, predicate, qualifiers_json, COUNT(*) AS weight
  FROM ids GROUP BY src_id, dst_id, predicate, qualifiers_json
)
SELECT w.src_id, w.dst_id, w.predicate, w.qualifiers_json, w.weight,
  agg.provenance_json
FROM w JOIN agg USING (src_id, dst_id, predicate, qualifiers_json)"""


__all__ = [
    "gold_triples_sql",
    "eval_pr_sql",
    "gold_slots_sql",
    "reconstruct_sql",
    "kg_nodes_sql",
    "kg_edges_sql",
    "POOL_TYPES",
]
