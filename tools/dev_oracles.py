#!/usr/bin/env python3
"""Dev scratchpad: validate the training-data-pipeline oracle SQL in DuckDB
before wiring the Spark side. Not part of the shipped library."""
import duckdb

con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')")

SIGS = ",\n    ".join(
    f"min(md5('{i}|' || s)) AS sig_{i}" for i in range(16))
BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(sig_{4*b}||'|'||sig_{4*b+1}||'|'||"
    f"sig_{4*b+2}||'|'||sig_{4*b+3}) AS h FROM sigs" for b in range(4))

MINHASH = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(ts) >= 3
    THEN list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> array_to_string(ts[i:i+2],' ')))
    ELSE [array_to_string(ts,' ')] END AS shset
  FROM toks
), ex AS (SELECT doc_id, unnest(shset) AS s FROM sh),
sigs AS (SELECT doc_id, {SIGS} FROM ex GROUP BY doc_id),
bands AS ({BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  round(CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE) /
        len(list_distinct(list_concat(sa.shset, sb.shset))), 4) AS jaccard
FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a
          JOIN sh sb ON sb.doc_id = cand.doc_b
WHERE jaccard >= 0.7
"""

JACCARD = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(ts) >= 3
    THEN list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> array_to_string(ts[i:i+2],' ')))
    ELSE [array_to_string(ts,' ')] END AS shset
  FROM toks
), inv AS (SELECT doc_id, unnest(shset) AS s FROM sh),
rare AS (SELECT s FROM inv GROUP BY s HAVING count(*) <= 1000 AND count(*) >= 2),
invr AS (SELECT inv.doc_id, inv.s FROM inv JOIN rare ON inv.s = rare.s),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM invr a JOIN invr b ON a.s = b.s WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  round(CAST(common AS DOUBLE) /
        (len(sa.shset) + len(sb.shset) - common), 4) AS jaccard
FROM common JOIN sh sa ON sa.doc_id = doc_a
            JOIN sh sb ON sb.doc_id = doc_b
WHERE jaccard >= 0.8
"""

STOP_EN = "['the','a','of','and','to','in','is','it','that','for']"
STOP_ES = "['el','la','de','que','y','en','un','es','se','no']"
STOP_DE = "['der','die','und','das','ist','ich','nicht','mit','ein','zu']"
STOP_FR = "['le','la','et','les','des','est','une','du','que','pas']"

TEXT = f"""
WITH toks AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
  FROM documents
), feat AS (
  SELECT doc_id, ts,
    len(ts) AS n_tokens,
    len(list_filter(ts, t -> list_contains({STOP_EN}, t))) AS hits_en,
    len(list_filter(ts, t -> list_contains({STOP_ES}, t))) AS hits_es,
    len(list_filter(ts, t -> list_contains({STOP_DE}, t))) AS hits_de,
    len(list_filter(ts, t -> list_contains({STOP_FR}, t))) AS hits_fr,
    CASE WHEN length(text) > 0 THEN
      round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS DOUBLE) / length(text), 4) ELSE 0.0 END AS punct_ratio
  FROM toks
), derived AS (
  SELECT doc_id, n_tokens, punct_ratio, ts,
    CASE WHEN n_tokens > 0
      THEN round(CAST(hits_en AS DOUBLE) / n_tokens, 4) ELSE 0.0 END
      AS stop_ratio,
    CASE WHEN n_tokens > 0
      THEN round(CAST(list_sum(list_transform(ts, t -> length(t)))
           AS DOUBLE) / n_tokens, 4) ELSE 0.0 END AS avg_wlen,
    CASE WHEN hits_en >= greatest(hits_es, hits_de, hits_fr) AND hits_en > 0
           THEN 'en'
         WHEN hits_es >= greatest(hits_de, hits_fr) AND hits_es > 0 THEN 'es'
         WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
         WHEN hits_fr > 0 THEN 'fr'
         ELSE 'und' END AS lang_id
  FROM feat
)
SELECT doc_id, n_tokens, stop_ratio, punct_ratio, avg_wlen, lang_id,
  round(least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.5 +
        stop_ratio * 0.3 +
        greatest(0.0, 1.0 - abs(avg_wlen - 4.5) / 10.0) * 0.2, 4) AS quality,
  md5(array_to_string(list_sort(list_distinct(ts)), '|')) AS fingerprint
FROM derived
"""

ANN = """
WITH v AS (
  SELECT vec_id,
    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS norm,
    embedding::DOUBLE[] AS e
  FROM embeddings
), u AS (
  SELECT vec_id, list_transform(e, x -> x / norm) AS unit
  FROM v WHERE norm > 0
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(generate_series(1, len(q.unit)),
             i -> q.unit[i] * c.unit[i])) AS cos_exact
  FROM u q JOIN u c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT query_id, neighbor_id, cos_exact,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_exact DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, round(cos_exact, 4) AS cosine
FROM ranked WHERE rank <= 5
"""

NEARDUP_EMB = """
WITH v AS (
  SELECT vec_id,
    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS norm,
    embedding::DOUBLE[] AS e
  FROM embeddings
), u AS (
  SELECT vec_id, list_transform(e, x -> x / norm) AS unit
  FROM v WHERE norm > 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_sum(list_transform(generate_series(1, len(a.unit)),
        i -> a.unit[i] * b.unit[i])), 4) AS cosine
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE cosine >= 0.45
"""

EXACT = ("SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, "
         "count(*) AS dup_count FROM documents GROUP BY 1")

if __name__ == "__main__":
    for name, sql in [("minhash", MINHASH), ("jaccard", JACCARD),
                      ("text", TEXT), ("ann", ANN),
                      ("neardup_emb", NEARDUP_EMB), ("exact", EXACT)]:
        df = con.sql(sql).df()
        print(f"== {name}: {len(df)} rows")
        print(df.head(3).to_string())
