package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Scale notes (100 TB design): the brute-force top-k broadcasts the (small)
  * query set against the full vector corpus — a map-only plan with no shuffle
  * except the final per-query top-k; norms are precomputed once per row; all
  * vector math is native codegen'd array expressions (zip_with/aggregate), no
  * UDFs. The LSH variant buckets the corpus by a 16-bit hyperplane signature so
  * each query only scans its own bucket (the 100 TB path: bucket-partitioned
  * storage + bucket equi-join instead of a full scan per query).
  */
object Similarity {
  import Tables.t

  private def asD(c: Column): Column = c.cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** embeddings with vec (double) + precomputed norm. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.spread(t(s, d, "embeddings")).select(col("vec_id"), col("label"), asD(col("embedding")).as("vec"))
      .withColumn("nrm", sqrt(dot(col("vec"), col("vec"))))

  // 16 deterministic pseudo-random hyperplanes over dim 64 (seeded LCG, no RNG state).
  private val planes: Array[Array[Double]] = Array.tabulate(16) { p =>
    Array.tabulate(64) { dd =>
      val x = (1103515245L * (p * 131 + dd + 1) + 12345L) & 0x7fffffffL
      x.toDouble / 0x7fffffffL.toDouble - 0.5
    }
  }

  private def lshCode(vec: Column): Column = {
    val bits = planes.zipWithIndex.map { case (pl, i) =>
      val plc = array(pl.map(lit): _*)
      when(dot(plc, vec) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  val entries: Seq[Q] = Seq(
    // ---- ss01: brute-force cosine top-5 per query vector (exact oracle) ----
    Q("ss01_cosine_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = vecs(s, d)
        val q = broadcast(all.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("vec").as("qv"), col("nrm").as("qn")))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        q.join(all, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            cosine(col("qv"), col("vec"), col("qn"), col("nrm")).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
          q AS (SELECT vec_id AS q_id, vec AS qv FROM v WHERE vec_id % 100 = 0),
          sims AS (SELECT q_id, vec_id, list_cosine_similarity(qv, vec) AS cos
                   FROM q JOIN v ON vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cos,
                       row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
                     FROM sims)
        SELECT q_id, vec_id AS neighbor_id, round(cos, 4) AS cos, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // ---- ss02: embedding near-duplicate pairs, label-blocked, cosine >= 0.4 ----
    Q("ss02_embed_neardup",
      (s, d) => {
        val v = vecs(s, d)
        val a = v.select(col("vec_id").as("id_a"), col("label"), col("vec").as("va"), col("nrm").as("na"))
        val b = v.select(col("vec_id").as("id_b"), col("label"), col("vec").as("vb"), col("nrm").as("nb"))
        a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(cosine(col("va"), col("vb"), col("na"), col("nb")), 4).as("cos"))
          .filter(col("cos") >= 0.4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
        SELECT id_a, id_b, cos FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            round(list_cosine_similarity(a.vec, b.vec), 4) AS cos
          FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE cos >= 0.4 ORDER BY id_a, id_b""")),

    // ---- ss03: LSH-bucketed approximate NN — scans only the query's bucket ----
    // Approximate by construction — no SQL oracle (rows-only check).
    Q("ss03_ann_lsh",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = vecs(s, d).withColumn("code", lshCode(col("vec"))).cache()
        val q = broadcast(v.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("vec").as("qv"), col("nrm").as("qn"), col("code")))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        q.join(v, Seq("code")).filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            cosine(col("qv"), col("vec"), col("qn"), col("nrm")).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      None)
  )
}
