# Round-3 calibration analysis (driver-side only, not shipped code):
# 1) hamming distribution of true jaccard>=0.8 pairs under a 64-bit simhash
# 2) cosine distribution of embedding pairs (what do planted near-dups look like)
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/{sf}/embeddings.parquet'")

votes = ",\n".join(
    [f"SUM(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(32)] +
    [f"SUM(((h2 >> {b - 32}) & 1) * 2 - 1) AS s{b}" for b in range(32, 64)])
combine = " + ".join(
    [f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(63)] +
    ["(CASE WHEN s63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"])

q = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) tok,
       LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3),
shh AS (SELECT doc_id, shingle,
        (('0x' || substr(md5(shingle), 1, 8))::BIGINT) AS h,
        (('0x' || substr(md5(shingle), 9, 8))::BIGINT) AS h2 FROM sh),
v AS (SELECT doc_id, {votes} FROM shh GROUP BY doc_id),
sig AS (SELECT doc_id, {combine} AS simhash FROM v),
shf AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle NOT IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1000)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
jp AS (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
  FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8)
SELECT jp.doc_a, jp.doc_b, jp.jaccard,
       bit_count(xor(sa.simhash, sb.simhash)) AS ham64
FROM jp JOIN sig sa ON jp.doc_a = sa.doc_id JOIN sig sb ON jp.doc_b = sb.doc_id
ORDER BY ham64 DESC
"""
rows = con.execute(q).fetchall()
print(f"== {sf}: jaccard>=0.8 pairs with 64-bit simhash hamming ==")
print(f"n_pairs={len(rows)}")
for r in rows[:15]:
    print(f"  pair=({r[0]},{r[1]}) jaccard={r[2]:.4f} ham64={r[3]}")
hams = sorted(r[3] for r in rows)
if hams:
    print(f"ham64: min={hams[0]} p50={hams[len(hams)//2]} max={hams[-1]}")
    print(f"pairs with ham64>7: {sum(1 for h in hams if h > 7)}")
    jac_of_high = [(r[2], r[3]) for r in rows if r[3] > 7]
    print(f"jaccard of ham64>7 pairs: {jac_of_high}")

# background hamming: sample of non-near-dup pairs
q2 = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) tok,
       LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3),
shh AS (SELECT doc_id, shingle,
        (('0x' || substr(md5(shingle), 1, 8))::BIGINT) AS h,
        (('0x' || substr(md5(shingle), 9, 8))::BIGINT) AS h2 FROM sh),
v AS (SELECT doc_id, {votes} FROM shh GROUP BY doc_id),
sig AS (SELECT doc_id, {combine} AS simhash FROM v)
SELECT avg(bit_count(xor(sa.simhash, sb.simhash))),
       min(bit_count(xor(sa.simhash, sb.simhash)))
FROM sig sa JOIN sig sb ON sa.doc_id + 1 = sb.doc_id
"""
print("background (adjacent-id pairs) ham64 avg/min:", con.execute(q2).fetchone())

# embeddings: cosine distribution of top pairs
dot = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
       "list_transform(list_zip(a.embedding, b.embedding), "
       "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)")
nrm = ("sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
       "list_transform(list_zip(embedding, embedding), "
       "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v))")
q3 = f"""
WITH e AS (SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, {dot} / (a.nrm * b.nrm) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT
  count(*) AS n_pairs,
  sum(CASE WHEN cos > 0.95 THEN 1 ELSE 0 END) AS gt95,
  sum(CASE WHEN cos > 0.9 THEN 1 ELSE 0 END) AS gt90,
  sum(CASE WHEN cos > 0.8 THEN 1 ELSE 0 END) AS gt80,
  sum(CASE WHEN cos > 0.6 THEN 1 ELSE 0 END) AS gt60,
  sum(CASE WHEN cos > 0.4 THEN 1 ELSE 0 END) AS gt40,
  max(cos) AS maxcos
FROM pairs
"""
print("== embedding pair cos distribution ==")
cols = ["n_pairs", ">0.95", ">0.9", ">0.8", ">0.6", ">0.4", "max"]
print(dict(zip(cols, con.execute(q3).fetchone())))
q4 = f"""
WITH e AS (SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, {dot} / (a.nrm * b.nrm) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT va, vb, cos FROM pairs WHERE cos > 0.8 ORDER BY cos LIMIT 20
"""
print("lowest cos>0.8 pairs:", con.execute(q4).fetchall())
