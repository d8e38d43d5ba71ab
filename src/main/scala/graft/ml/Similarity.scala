package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2C): exact brute-force top-k as the correctness
  * baseline, SRP-LSH bucketed ANN as the scale path.
  *
  * Scale design: the probe set is small and BROADCAST — the corpus
  * side streams once and is never cross-joined with itself. The LSH
  * variant prunes the corpus to bucket-mates before any distance
  * math; at 100 TB that is the difference between a scan and an
  * impossible O(n·probes) full pass per probe batch (brute force is
  * kept only as the small-probe baseline / recall oracle).
  */
object Similarity {

  val TopK = 5
  val NumProbes = 8

  /** Persist and materialize a multi-consumer intermediate (see
    * Dedup.materialize — avoids per-branch recompute races).
    */
  private def materialize(df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    p
  }

  /** Exact top-k cosine neighbors for probe vectors (vec_id <
    * NumProbes). The probe side broadcasts; ranking is a window per
    * probe with a deterministic (cos desc, vec_id) tiebreak.
    */
  def topKBruteForce(embs: DataFrame): DataFrame = {
    val qv = materialize(Vectors.quantized(embs))
    val probes = broadcast(
      qv.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("probe_id"), col("q").as("q_p"), col("n2").as("n2_p")))
    val scored = qv.join(probes, col("vec_id") =!= col("probe_id"))
      .withColumn("cos_sim",
        Vectors.cosine(Vectors.dot(col("q_p"), col("q")), col("n2_p"), col("n2")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("cos_sim"), col("rk"))
  }

  /** SRP-LSH ANN: candidates are corpus vectors sharing any band
    * bucket with the probe; exact cosine ranks within candidates.
    * Same bucket structure as Dedup.embeddingPairs.
    */
  def topKAnnLsh(embs: DataFrame): DataFrame = {
    // identical plan to Dedup.embeddingPairs' view — shared cache
    val qv = materialize(Vectors.quantizedWithBuckets(embs,
      Dedup.EmbBands, Dedup.EmbRowsPerBand, Dedup.EmbDim))
    val flat = qv.select(col("vec_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    val probeFlat = broadcast(flat.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("band").as("band_p"),
        col("bucket").as("bucket_p")))
    val cands = flat.join(probeFlat,
        col("band") === col("band_p") && col("bucket") === col("bucket_p") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id")).distinct()
    val probes = qv.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("q_p"), col("n2").as("n2_p"))
    val scored = cands
      .join(qv.select(col("vec_id"), col("q"), col("n2")), "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cos_sim",
        Vectors.cosine(Vectors.dot(col("q_p"), col("q")), col("n2_p"), col("n2")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("cos_sim"), col("rk"))
  }
}
