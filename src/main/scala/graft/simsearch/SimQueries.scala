package graft.simsearch

import graft.{QueryModule, SqlQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity search over the `embeddings` table (`Array[Float]` 64-d
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * blocked near-duplicate pair scan, and an IVF (inverted-file)
  * variant as the scale path.
  *
  * Determinism contract (driver compares doubles exactly): every dot
  * product is an index-ordered sum of `double` products — Spark runs it
  * through the codegen'd `vec_dot` expression, the DuckDB oracle
  * through an index-ordered `list_reduce`; IEEE-754 per-op rounding
  * makes the results bit-identical. Centroids fold vectors in `vec_id`
  * order for the same reason.
  *
  * Scale notes: top-k per query is a crossJoin(Q, N) — fine when Q is
  * small/broadcast; for all-pairs work use IVF cells (or LSH buckets)
  * as the blocking key so the shuffle is per-cell, not n². The IVF
  * centroid build is one groupBy(label); assignment/probe joins
  * broadcast the (tiny) centroid table.
  */
object SimQueries extends QueryModule {

  /** Spark: vectors as array<double> with norms. */
  private val sparkVecs =
    """WITH v AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(vec_dot(v, v)) AS nrm FROM v)""".stripMargin

  /** DuckDB mirror: index-ordered folds reproduce vec_dot exactly. */
  private val duckVecs =
    """WITH v AS (SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_reduce([y*y for y in v], (a,b) -> a+b)) AS nrm FROM v)""".stripMargin

  private val duckDot =
    "list_reduce([QA[k] * QB[k] for k in generate_series(1, len(QA))], (a,b) -> a+b)"
  private def dDot(a: String, b: String): String =
    duckDot.replace("QA", a).replace("QB", b)

  private val sqls: Seq[SqlQ] = Seq(

    // E1: brute-force cosine top-10 for 5 query vectors — the exact
    // baseline every ANN variant is judged against. Query side is tiny
    // => broadcast; the scan side streams once.
    SqlQ.split("e1_knn_bruteforce",
      s"""$sparkVecs,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |s AS (SELECT qid, n.vec_id AS nid, vec_dot(qv, n.v) / (qn * n.nrm) AS sim
         |      FROM q CROSS JOIN n WHERE n.vec_id != qid)
         |SELECT qid AS query_id, nid AS neighbor_id, sim AS cosine, rnk
         |FROM (SELECT qid, nid, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s) t
         |WHERE rnk <= 10""".stripMargin,
      s"""$duckVecs,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |s AS (SELECT qid, n.vec_id AS nid, ${dDot("qv", "n.v")} / (qn * n.nrm) AS sim
         |      FROM q CROSS JOIN n WHERE n.vec_id != qid)
         |SELECT qid AS query_id, nid AS neighbor_id, sim AS cosine, rnk
         |FROM (SELECT qid, nid, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s) t
         |WHERE rnk <= 10""".stripMargin),

    // E2: embedding-cosine near-dup pairs, blocked by label (the
    // cluster id doubles as the blocking key — the all-pairs scan runs
    // per block, never globally n²).
    SqlQ.split("e2_cosine_neardup",
      s"""$sparkVecs
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label AS label,
         |  vec_dot(a.v, b.v) / (a.nrm * b.nrm) AS cosine
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE vec_dot(a.v, b.v) / (a.nrm * b.nrm) >= 0.35""".stripMargin,
      s"""$duckVecs
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label AS label,
         |  ${dDot("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${dDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35""".stripMargin),

    // E4: random-hyperplane LSH near-dup — bucket-join candidates from
    // 48 tables × 6 sign bits (rph_sig), exact-cosine verification.
    // The oracle is the global brute-force pair scan: equality holds
    // because the table count is tuned for full recall at this τ on
    // this dataset (verified empirically; recall is tunable, the
    // candidate join is the scale path).
    SqlQ.split("e4_ann_lsh_pairs",
      s"""$sparkVecs,
         |sig AS (SELECT vec_id, rph_sig(v, 48, 6) AS sg FROM n),
         |b AS (SELECT vec_id, t, bv FROM sig LATERAL VIEW posexplode(sg) x AS t, bv),
         |cand AS (SELECT DISTINCT a.vec_id AS i, b2.vec_id AS j
         |  FROM b a JOIN b b2 ON a.t = b2.t AND a.bv = b2.bv AND a.vec_id < b2.vec_id),
         |ver AS (SELECT i, j, vec_dot(x.v, y.v) / (x.nrm * y.nrm) AS cosine
         |  FROM cand JOIN n x ON x.vec_id = cand.i JOIN n y ON y.vec_id = cand.j)
         |SELECT i AS vec_id_a, j AS vec_id_b, cosine FROM ver WHERE cosine >= 0.4""".stripMargin,
      s"""$duckVecs
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |  ${dDot("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
         |FROM n a, n b WHERE a.vec_id < b.vec_id
         |  AND ${dDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.4""".stripMargin),

    // E5: k-means clustering (the IVF coarse-quantizer build): seeds =
    // vectors 0..9, one Lloyd iteration — assignment by max cosine with
    // deterministic tie-break, centroid update as a vec_id-ordered
    // elementwise fold (bit-reproducible), re-assignment. The oracle
    // replays the identical iteration.
    SqlQ.split("e5_kmeans_assign",
      s"""$sparkVecs,
         |seed AS (SELECT vec_id AS sid, v AS sv, nrm AS snrm FROM n WHERE vec_id < 10),
         |a1 AS (SELECT n.vec_id, n.v, seed.sid,
         |        row_number() OVER (PARTITION BY n.vec_id
         |          ORDER BY vec_dot(n.v, seed.sv) / (n.nrm * seed.snrm) DESC, seed.sid) AS r
         |       FROM n CROSS JOIN seed),
         |asg1 AS (SELECT vec_id, v, sid AS c FROM a1 WHERE r = 1),
         |g AS (SELECT c, sort_array(collect_list(struct(vec_id, v))) AS arr, count(*) AS cnt
         |      FROM asg1 GROUP BY c),
         |cen AS (SELECT c, transform(
         |    aggregate(arr, array_repeat(CAST(0 AS DOUBLE), 64), (acc, e) -> zip_with(acc, e.v, (p,q) -> p+q)),
         |    x -> x / cnt) AS cv FROM g),
         |cn AS (SELECT c, cv, sqrt(vec_dot(cv, cv)) AS cnrm FROM cen),
         |a2 AS (SELECT n.vec_id, cn.c,
         |        row_number() OVER (PARTITION BY n.vec_id
         |          ORDER BY vec_dot(n.v, cn.cv) / (n.nrm * cn.cnrm) DESC, cn.c) AS r
         |       FROM n CROSS JOIN cn)
         |SELECT vec_id, c AS cluster_id FROM a2 WHERE r = 1""".stripMargin,
      s"""$duckVecs,
         |seed AS (SELECT vec_id AS sid, v AS sv, nrm AS snrm FROM n WHERE vec_id < 10),
         |a1 AS (SELECT n.vec_id, n.v, seed.sid,
         |        row_number() OVER (PARTITION BY n.vec_id
         |          ORDER BY ${dDot("n.v", "seed.sv")} / (n.nrm * seed.snrm) DESC, seed.sid) AS r
         |       FROM n CROSS JOIN seed),
         |asg1 AS (SELECT vec_id, v, sid AS c FROM a1 WHERE r = 1),
         |g AS (SELECT c, list(v ORDER BY vec_id) AS arr, count(*) AS cnt
         |      FROM asg1 GROUP BY c),
         |cen AS (SELECT c, [x / cnt for x in
         |    list_reduce(arr, (a,b) -> [a[k] + b[k] for k in generate_series(1, len(a))])] AS cv FROM g),
         |cn AS (SELECT c, cv, sqrt(list_reduce([y*y for y in cv], (a,b) -> a+b)) AS cnrm FROM cen),
         |a2 AS (SELECT n.vec_id, cn.c,
         |        row_number() OVER (PARTITION BY n.vec_id
         |          ORDER BY ${dDot("n.v", "cn.cv")} / (n.nrm * cn.cnrm) DESC, cn.c) AS r
         |       FROM n CROSS JOIN cn)
         |SELECT vec_id, c AS cluster_id FROM a2 WHERE r = 1""".stripMargin),

    // E6: int8 scalar quantization — the embedding-compression storage
    // path (4× smaller vectors at rest). Per-vector max-abs scale,
    // floor quantization (floor, not round: round ties differ between
    // engines), index-ordered reconstruction-error fold.
    SqlQ.split("e6_scalar_quantize",
      s"""$sparkVecs,
         |s AS (SELECT vec_id, v,
         |        aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x))) AS scale FROM v),
         |q AS (SELECT vec_id, v, scale,
         |        transform(v, x -> CAST(floor(x / scale * 127.0) AS INT)) AS qv FROM s)
         |SELECT vec_id, scale,
         |  aggregate(qv, 0, (a, b) -> a + b) AS q_sum,
         |  aggregate(zip_with(v, qv, (x, qq) ->
         |      (x - CAST(qq AS DOUBLE) * scale / 127.0) * (x - CAST(qq AS DOUBLE) * scale / 127.0)),
         |    CAST(0 AS DOUBLE), (a, b) -> a + b) AS recon_err
         |FROM q""".stripMargin,
      s"""$duckVecs,
         |s AS (SELECT vec_id, v,
         |        list_reduce([abs(x) for x in v], (a, b) -> greatest(a, b)) AS scale FROM v),
         |q AS (SELECT vec_id, v, scale,
         |        [CAST(floor(x / scale * 127.0) AS INT) for x in v] AS qv FROM s)
         |SELECT vec_id, scale,
         |  list_reduce(qv, (a, b) -> a + b) AS q_sum,
         |  list_reduce([(v[k] - CAST(qv[k] AS DOUBLE) * scale / 127.0)
         |               * (v[k] - CAST(qv[k] AS DOUBLE) * scale / 127.0)
         |               for k in generate_series(1, len(v))], (a, b) -> a + b) AS recon_err
         |FROM q""".stripMargin),

    // E3: IVF top-5 — centroid per cell (vec_id-ordered fold => exact
    // cross-engine reproducibility), probe the 2 nearest cells, exact
    // search inside probed cells only. The candidate set is a cell
    // join, not a full scan: the 100 TB path.
    SqlQ.split("e3_ann_ivf",
      s"""$sparkVecs,
         |g AS (SELECT label, sort_array(collect_list(struct(vec_id, v))) AS arr, count(*) AS c
         |      FROM v GROUP BY label),
         |cen AS (SELECT label, transform(
         |    aggregate(arr, array_repeat(CAST(0 AS DOUBLE), 64), (acc, e) -> zip_with(acc, e.v, (p,q) -> p+q)),
         |    x -> x / c) AS cv FROM g),
         |cn AS (SELECT label, cv, sqrt(vec_dot(cv, cv)) AS cnrm FROM cen),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |pc AS (SELECT qid, cn.label,
         |        row_number() OVER (PARTITION BY qid ORDER BY vec_dot(qv, cv) / (qn * cnrm) DESC, cn.label) AS cr
         |       FROM q CROSS JOIN cn),
         |probe AS (SELECT qid, label FROM pc WHERE cr <= 2),
         |s AS (SELECT q.qid, n.vec_id AS nid, vec_dot(q.qv, n.v) / (q.qn * n.nrm) AS sim
         |      FROM q JOIN probe ON probe.qid = q.qid
         |             JOIN n ON n.label = probe.label AND n.vec_id != q.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, sim AS cosine, rnk
         |FROM (SELECT qid, nid, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s) t
         |WHERE rnk <= 5""".stripMargin,
      s"""$duckVecs,
         |g AS (SELECT label, list(v ORDER BY vec_id) AS arr, count(*) AS c
         |      FROM v GROUP BY label),
         |cen AS (SELECT label, [x / c for x in
         |    list_reduce(arr, (a,b) -> [a[k] + b[k] for k in generate_series(1, len(a))])] AS cv FROM g),
         |cn AS (SELECT label, cv, sqrt(list_reduce([y*y for y in cv], (a,b) -> a+b)) AS cnrm FROM cen),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |pc AS (SELECT qid, cn.label,
         |        row_number() OVER (PARTITION BY qid ORDER BY ${dDot("qv", "cv")} / (qn * cnrm) DESC, cn.label) AS cr
         |       FROM q CROSS JOIN cn),
         |probe AS (SELECT qid, label FROM pc WHERE cr <= 2),
         |s AS (SELECT q.qid, n.vec_id AS nid, ${dDot("q.qv", "n.v")} / (q.qn * n.nrm) AS sim
         |      FROM q JOIN probe ON probe.qid = q.qid
         |             JOIN n ON n.label = probe.label AND n.vec_id != q.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, sim AS cosine, rnk
         |FROM (SELECT qid, nid, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s) t
         |WHERE rnk <= 5""".stripMargin)
  )

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqls.map { q =>
      q.name -> ((spark: SparkSession, sfDir: String) => {
        Tables.register(spark, sfDir)
        spark.sql(q.sparkSql)
      })
    }.toMap

  override def oracles: Map[String, String] =
    sqls.flatMap(q => q.oracleSql.map(q.name -> _)).toMap
}
