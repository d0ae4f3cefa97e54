"""DuckDB oracle SQL for the KG pipeline over the driver's `documents` table.

The driver (see __spark_entry__.py) runs each Spark query and the matching
SQL here side-by-side.  The SQL is an independent re-implementation of the
full pipeline semantics (rules.py) as one CTE chain: transcripts derivation,
provenance + mention extraction, four-section dictionary with
row_number-per-sorted-section IDs, shared-offset global IDs, encode+dedup.

DuckDB's default collation is binary, matching Spark's UTF8 binary string
ordering, so dictionary IDs agree exactly.
"""

from __future__ import annotations

from . import rules, vocab


def kg_cte() -> str:
    """The shared WITH-prefix implementing the whole pipeline in SQL."""
    pattern = vocab.MENTION_PATTERN
    vocab_values = vocab.vocab_sql_values()
    return f"""
WITH transcripts AS (
  SELECT 'conv-' || CAST(doc_id AS VARCHAR) AS conv_id,
         0 AS turn_idx, 'user' AS role, text
  FROM documents
),
turns AS (
  SELECT conv_id, turn_idx, role, text,
         '{rules.BASE}/conv/' || conv_id AS conv,
         '{rules.BASE}/conv/' || conv_id || '/t/' || CAST(turn_idx AS VARCHAR) AS turn
  FROM transcripts
),
prov AS (
  SELECT conv AS s, '{rules.P_HASTURN}' AS p, turn AS o, conv_id, turn_idx FROM turns
  UNION ALL
  SELECT turn, '{rules.P_INDEX}',
         '"' || CAST(turn_idx AS VARCHAR) || '"^^<{rules.XSD_INTEGER}>',
         conv_id, turn_idx FROM turns
  UNION ALL
  SELECT turn, '{rules.P_ROLE}', '"' || role || '"', conv_id, turn_idx FROM turns
  UNION ALL
  SELECT turn, '{rules.P_TEXT}', '"' || text || '"', conv_id, turn_idx FROM turns
),
occ AS (
  SELECT conv_id, turn_idx, turn, u.surface AS surface, COUNT(*) AS occ
  FROM turns, unnest(regexp_extract_all(lower(text), '{pattern}', 1)) AS u(surface)
  GROUP BY 1, 2, 3, 4
),
linked AS (
  SELECT occ.conv_id, occ.turn_idx, occ.turn, v.slug,
         row_number() OVER (
           PARTITION BY occ.conv_id, occ.turn_idx, occ.surface
           ORDER BY v.prior + 0.05 * CAST(occ.occ >= 2 AS INT) DESC, v.slug
         ) AS rn
  FROM occ JOIN {vocab_values} ON occ.surface = v.surface
),
winners AS (
  SELECT conv_id, turn_idx, turn, '{rules.BASE}/e/' || slug AS ent
  FROM linked WHERE rn = 1
),
raw AS (
  SELECT * FROM prov
  UNION ALL
  SELECT turn, '{rules.P_MENTIONS}', ent, conv_id, turn_idx FROM winners
  UNION ALL
  SELECT ent, '{rules.P_TYPE}', '{rules.C_ENTITY}', conv_id, turn_idx FROM winners
),
tri AS (SELECT DISTINCT s, p, o FROM raw),
subj_terms AS (SELECT DISTINCT s AS term FROM tri),
obj_terms AS (SELECT DISTINCT o AS term FROM tri),
shared_terms AS (SELECT term FROM subj_terms INTERSECT SELECT term FROM obj_terms),
subj_only AS (SELECT term FROM subj_terms EXCEPT SELECT term FROM obj_terms),
obj_only AS (SELECT term FROM obj_terms EXCEPT SELECT term FROM subj_terms),
pred_terms AS (SELECT DISTINCT p AS term FROM tri),
d_shared AS (SELECT term, row_number() OVER (ORDER BY term) AS id FROM shared_terms),
d_subj AS (SELECT term, row_number() OVER (ORDER BY term) AS id FROM subj_only),
d_obj AS (SELECT term, row_number() OVER (ORDER BY term) AS id FROM obj_only),
d_pred AS (SELECT term, row_number() OVER (ORDER BY term) AS id FROM pred_terms),
nsh AS (SELECT COUNT(*) AS n FROM shared_terms),
subj_dict AS (
  SELECT term, id FROM d_shared
  UNION ALL SELECT term, id + (SELECT n FROM nsh) FROM d_subj
),
obj_dict AS (
  SELECT term, id FROM d_shared
  UNION ALL SELECT term, id + (SELECT n FROM nsh) FROM d_obj
),
spo AS (
  SELECT DISTINCT sd.id AS s, pd.id AS p, od.id AS o
  FROM tri
  JOIN subj_dict sd ON tri.s = sd.term
  JOIN d_pred pd ON tri.p = pd.term
  JOIN obj_dict od ON tri.o = od.term
)
"""


def kg_oracle(final_select: str) -> str:
    return kg_cte() + final_select
