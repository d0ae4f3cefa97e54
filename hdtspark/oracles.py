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


_NT_LIT_RE = '^"((?s).*)"((\\^\\^<[^>]*>)|(@[A-Za-z0-9\\-]*))?$'


def _nt_armor_sql(col: str) -> str:
    """Independent SQL of export._armor: IRIs get <>, literal lexical forms
    are NT-escaped (backslash first), blank nodes pass through."""
    lex = f"regexp_extract({col}, '{_NT_LIT_RE}', 1)"
    suf = f"regexp_extract({col}, '{_NT_LIT_RE}', 2)"
    esc = (f"replace(replace(replace(replace(replace({lex}, "
           "'\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n'), "
           "chr(13), '\\r'), chr(9), '\\t')")
    return (f"CASE WHEN substr({col}, 1, 1) = '\"' "
            f"THEN '\"' || {esc} || '\"' || {suf} "
            f"WHEN substr({col}, 1, 1) = '_' THEN {col} "
            f"ELSE '<' || {col} || '>' END")


def export_nt_oracle() -> str:
    """One N-Triples line per SPO triple (S5 export, ref src/hdt.rs:92-98)."""
    return kg_oracle(
        f"SELECT {_nt_armor_sql('s')} || ' ' || {_nt_armor_sql('p')} || ' ' "
        f"|| {_nt_armor_sql('o')} || ' .' AS value FROM tri"
    )


def bgp_oracle(p_mentions: str, p_type: str, c_entity: str) -> str:
    """Two-pattern BGP join through ?ent (ref src/sparql.rs:114-120)."""
    return kg_oracle(
        f"SELECT t1.o AS ent, t1.s AS turn FROM tri t1 "
        f"JOIN tri t2 ON t2.s = t1.o "
        f"WHERE t1.p = '{p_mentions}' AND t2.p = '{p_type}' "
        f"AND t2.o = '{c_entity}'"
    )


# ---------------------------------------------------------------------------
# Training-data-pipeline extras (dedup / text analysis / ANN / multimodal)
# ---------------------------------------------------------------------------

# Augmented corpus for dedup: inject exact duplicates of every 10th doc.
DD_DOCS = """
dd_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
"""

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"


def _shingles_sql(k: int) -> str:
    return (
        f"list_distinct([array_to_string(toks[i:i+{k - 1}], ' ') "
        f"for i in generate_series(1, greatest(len(toks) - {k} + 1, 1))])"
    )


def dedup_shingle_cte(k: int = 5) -> str:
    return f"""
toksd AS (SELECT doc_id, {_TOKS} AS toks FROM dd_docs),
shingled AS (SELECT doc_id, unnest({_shingles_sql(k)}) AS shingle FROM toksd),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id)
"""


def minhash_oracle(num_hashes: int = 8, bands: int = 4,
                   threshold: float = 0.7) -> str:
    r = num_hashes // bands
    sig_cols = ", ".join(
        f"min(md5('{j}|' || shingle)) AS sig_{j}" for j in range(num_hashes))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({expr}) AS band_val FROM sigs".format(
            b=b,
            expr=" || '|' || ".join(f"sig_{b * r + i}" for i in range(r)),
        )
        for b in range(bands)
    )
    return f"""
WITH {DD_DOCS.strip().rstrip()},
{dedup_shingle_cte().strip().lstrip()},
sigs AS (SELECT doc_id, {sig_cols} FROM shingled GROUP BY doc_id),
bands AS ({band_rows}),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r2.doc_id AS b
  FROM bands l JOIN bands r2
    ON l.band_idx = r2.band_idx AND l.band_val = r2.band_val
  WHERE l.doc_id < r2.doc_id
),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS n_inter
  FROM cands c
  JOIN shingled sa ON sa.doc_id = c.a
  JOIN shingled sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
       round(CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter), 4) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
WHERE round(CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter), 4) >= {threshold}
"""


def ngram_jaccard_oracle(k: int = 5, threshold: float = 0.5) -> str:
    return f"""
WITH {DD_DOCS.strip()},
{dedup_shingle_cte(k).strip()},
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, COUNT(*) AS n_inter
  FROM shingled sa JOIN shingled sb
    ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       round(CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter), 4) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
WHERE round(CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter), 4) >= {threshold}
"""


def simhash_oracle(max_hamming: int = 3, bits: int = 60) -> str:
    """Independent SQL re-implementation of SimHash + chunk-LSH pairing.

    Same public math as hdtspark.dedup.simhashes/simhash_near_pairs: 60-bit
    md5-derived token hashes, majority vote per bit, 4x15-bit chunk LSH,
    exact Hamming via bit_count(xor).
    """
    bit_sums = ", ".join(f"SUM((h >> {b}) & 1) AS b{b}" for b in range(bits))
    sim_expr = " + ".join(
        f"CASE WHEN 2 * b{b} > n THEN {1 << b} ELSE 0 END" for b in range(bits))
    return f"""
WITH {DD_DOCS.strip()},
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x != '')) AS tok
  FROM dd_docs
),
h AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(tok), 1, 15) AS UBIGINT) AS BIGINT) AS h
  FROM toks
),
bitsums AS (SELECT doc_id, COUNT(*) AS n, {bit_sums} FROM h GROUP BY doc_id),
sh0 AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM bitsums),
sh AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM (SELECT doc_id FROM dd_docs) d LEFT JOIN sh0 s USING (doc_id)
),
chunks AS (
  SELECT doc_id, simhash, c AS chunk_idx,
         (simhash >> (c * 15)) & 32767 AS chunk_val
  FROM sh, unnest([0, 1, 2, 3]) AS t(c)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r2.doc_id AS b,
         CAST(bit_count(xor(l.simhash, r2.simhash)) AS BIGINT) AS hamming
  FROM chunks l JOIN chunks r2
    ON l.chunk_idx = r2.chunk_idx AND l.chunk_val = r2.chunk_val
   AND l.doc_id < r2.doc_id
)
SELECT a, b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


def exact_dedup_oracle() -> str:
    return f"""
WITH {DD_DOCS.strip()}
SELECT md5(text) AS text_hash, COUNT(*) AS cnt, MIN(doc_id) AS keep_id
FROM dd_docs GROUP BY 1 HAVING COUNT(*) > 1
"""


def _dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _plane_dot_duck(col: str, w: list[int], quant: int) -> str:
    """Exact integer plane dot: explicit term sum (order-free, no floats)."""
    return " + ".join(
        f"CAST(round({col}[{i + 1}] * {quant}) AS BIGINT) * ({w[i]})"
        for i in range(len(w)))


def _band_exprs_duck(col: str = "embedding", bands: int | None = None,
                     bits: int | None = None) -> list[str]:
    """One packed-int expression per LSH band, same planes as simsearch.
    ``bands``/``bits`` default to the simsearch production parameters."""
    from . import simsearch
    from .simsearch import LSH_DIM, LSH_QUANT, hyperplanes

    bands = simsearch.LSH_BANDS if bands is None else bands
    bits = simsearch.LSH_BITS if bits is None else bits
    planes = hyperplanes(bands * bits, LSH_DIM)
    out = []
    for b in range(bands):
        out.append(" + ".join(
            f"(CASE WHEN ({_plane_dot_duck(col, planes[b * bits + i], LSH_QUANT)})"
            f" > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)))
    return out


def _bands_cte(src: str, bands: int | None = None,
               bits: int | None = None) -> str:
    """bands(vec_id, band_idx, band_val) over ``src(vec_id, embedding)``."""
    exprs = _band_exprs_duck(bands=bands, bits=bits)
    rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, band_{b} AS band_val FROM wb"
        for b in range(len(exprs)))
    cols = ", ".join(f"{e} AS band_{b}" for b, e in enumerate(exprs))
    return f"wb AS (SELECT vec_id, embedding, {cols} FROM {src}),\nbands AS ({rows})"


def ann_oracle(query_ids: list[int], k: int, bucketed: bool,
               bands: int | None = None, bits: int | None = None) -> str:
    qids = ", ".join(str(q) for q in query_ids)
    cos = (f"round({_dot('q.embedding', 'e.embedding')} / "
           f"(sqrt({_dot('q.embedding', 'q.embedding')}) * "
           f"sqrt({_dot('e.embedding', 'e.embedding')})), 4)")
    if bucketed:
        return f"""
WITH {_bands_cte('embeddings', bands, bits)},
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, eb.vec_id
  FROM bands qb JOIN bands eb
    ON qb.band_idx = eb.band_idx AND qb.band_val = eb.band_val
  WHERE qb.vec_id IN ({qids}) AND eb.vec_id != qb.vec_id
),
scored AS (
  SELECT c.query_id, c.vec_id, {cos} AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
)
SELECT query_id, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN ({qids})),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS score
  FROM embeddings e, q WHERE e.vec_id != q.query_id
)
SELECT query_id, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def embedding_dedup_oracle(threshold: float, bands: int | None = None,
                           bits: int | None = None) -> str:
    cos = (f"round({_dot('l.embedding', 'r2.embedding')} / "
           f"(sqrt({_dot('l.embedding', 'l.embedding')}) * "
           f"sqrt({_dot('r2.embedding', 'r2.embedding')})), 4)")
    return f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
),
{_bands_cte('emb', bands, bits)},
cand AS (
  SELECT DISTINCT lb.vec_id AS a, rb.vec_id AS b
  FROM bands lb JOIN bands rb
    ON lb.band_idx = rb.band_idx AND lb.band_val = rb.band_val
  WHERE lb.vec_id < rb.vec_id
)
SELECT c.a, c.b, {cos} AS cosine
FROM cand c
JOIN emb l ON l.vec_id = c.a
JOIN emb r2 ON r2.vec_id = c.b
WHERE {cos} >= {threshold}
"""


def textops_oracles() -> dict[str, str]:
    from .textops import LANG_MARKERS, STOPWORDS, lang_id_oracle_sql_case

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    langs = sorted(LANG_MARKERS)
    score_cols = ", ".join(
        "len(list_filter(toks, x -> x IN ({m}))) AS s_{lg}".format(
            m=", ".join(f"'{w}'" for w in LANG_MARKERS[lg]), lg=lg)
        for lg in langs
    )
    return {
        "tx_tokens": f"""
SELECT doc_id, len({_TOKS}) AS n_tokens, length(text) AS n_chars_m
FROM documents
""",
        "tx_quality": f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
         CAST(len(list_filter({_TOKS}, x -> x IN ({stop_list}))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       round(n_stop / n_tok, 4) AS stop_ratio,
       round(least(1.0, n_tok / 100.0) * (1 - n_stop / n_tok), 4) AS quality
FROM t
""",
        "tx_langid": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {score_cols} FROM t)
SELECT doc_id, {lang_id_oracle_sql_case()} AS pred_lang FROM s
""",
        "tx_fingerprint": """
SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
""",
    }


def resize_oracle(width: int = 64, height: int = 64) -> str:
    target = max(1, width * height // 8)
    out = (f"substring(repeat(text, CAST({target} / greatest(length(text), 1)"
           f" AS INT) + 1), 1, {target})")
    return f"""
SELECT doc_id, CAST({width} AS INT) AS width, CAST({height} AS INT) AS height,
       md5({out}) AS out_sig
FROM documents
"""


def frames_oracle(stride: int = 2) -> str:
    return f"""
WITH m AS (
  SELECT doc_id, text, 1 + octet_length(encode(text)) % 5 AS frames
  FROM documents
),
fr AS (
  SELECT doc_id, text, unnest(generate_series(0, frames - 1, {stride})) AS frame_idx
  FROM m
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sig
FROM fr
"""


def multimodal_oracle() -> str:
    return """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       CAST(64 + n % 64 AS INT) AS width,
       CAST(64 + (7 * n) % 64 AS INT) AS height,
       CAST(1 + n % 5 AS INT) AS frames
FROM m
"""
