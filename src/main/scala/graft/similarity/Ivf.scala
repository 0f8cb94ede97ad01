package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.dotProduct

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes
  * only its `nprobe` nearest cells and runs exact cosine inside them.
  *
  * The scale shape: centroids are tiny (nlist ≈ √N) and broadcast;
  * corpus vectors are assigned to cells once (one KMeans fit + one
  * transform); per query the candidate set shrinks by ~nlist/nprobe.
  * Complements the hyperplane-LSH path in [[Similarity]] — IVF adapts
  * to the data distribution, LSH needs no training. */
object Ivf {

  final case class Index(assignments: DataFrame, centroids: DataFrame)

  /** Fit the coarse quantizer and assign every vector to a cell.
    * `assignments`: (vec_id, emb double[], norm, cluster);
    * `centroids`: (cluster, c_emb double[], c_norm). */
  def buildIndex(embeddings: DataFrame, nlist: Int = 16,
                 seed: Long = 42L): Index = {
    val spark = embeddings.sparkSession
    val prep = embeddings
      .withColumn("emb", transform(col("embedding"), _.cast("double")))
      .withColumn("norm", sqrt(dotProduct(col("emb"), col("emb"))))
      .select("vec_id", "emb", "norm")
    val withVec = prep.withColumn("features", array_to_vector(col("emb")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").fit(withVec)
    // persist: search() consumes assignments on BOTH sides of its join
    // (query lookup + probed cells) — without this the corpus scan +
    // KMeans transform re-executes per consumer, defeating the
    // "assigned once" design
    val assignments = model.transform(withVec)
      .select(col("vec_id"), col("emb"), col("norm"),
        col("prediction").as("cluster"))
      .persist()
    val centroidRows = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray)
    }
    import spark.implicits._
    val centroids = centroidRows.toSeq.toDF("cluster", "c_emb")
      .withColumn("c_norm", sqrt(dotProduct(col("c_emb"), col("c_emb"))))
    Index(assignments, centroids)
  }

  /** Top-k cosine neighbors for `queryIds`, probing `nprobe` cells. */
  def search(index: Index, queryIds: Seq[Long], k: Int = 5,
             nprobe: Int = 4): DataFrame =
    searchImpl(index,
      index.assignments
        .filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
          col("norm").as("q_norm")),
      k, nprobe)

  /** k-NN JOIN through the index: for EVERY row of `queries` (needs
    * `(vec_id, embedding)` — an external frame, not ids of indexed
    * vectors), the top-k cosine neighbors among the indexed corpus,
    * probing `nprobe` cells per query. This is the SCALE path for
    * cross-corpus ANN: queries are never broadcast — cell ranking is a
    * broadcast of the tiny centroid table, and candidate scoring
    * shuffles on the cell key, so a corpus-sized query side
    * distributes like any equi-join (a probed mega-cell is ordinary
    * join-key skew — AQE's skew split applies). Exact twin for
    * validation: [[Similarity.knnJoin]]. */
  def searchJoin(index: Index, queries: DataFrame, k: Int = 5,
                 nprobe: Int = 4): DataFrame =
    searchImpl(index,
      queries
        .withColumn("q_emb", transform(col("embedding"), _.cast("double")))
        .withColumn("q_norm", sqrt(dotProduct(col("q_emb"), col("q_emb"))))
        .select(col("vec_id").as("query_id"), col("q_emb"), col("q_norm")),
      k, nprobe)

  private def searchImpl(index: Index, queries: DataFrame, k: Int,
                         nprobe: Int): DataFrame = {
    // rank cells per query by centroid cosine; keep nprobe
    val byQuery = Window.partitionBy("query_id")
    val probes = queries
      .join(broadcast(index.centroids))
      .withColumn("c_sim",
        when(col("q_norm") > 0 && col("c_norm") > 0,
          dotProduct(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))))
      .withColumn("c_rank",
        row_number().over(byQuery.orderBy(desc("c_sim"), asc("cluster"))))
      .filter(col("c_rank") <= nprobe)
      .select("query_id", "q_emb", "q_norm", "cluster")
    // exact cosine inside probed cells only
    val scored = probes
      .join(index.assignments, "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("q_norm") > 0 && col("norm") > 0,
          dotProduct(col("q_emb"), col("emb")) / (col("q_norm") * col("norm")))
          .as("sim"))
    scored
      .withColumn("rank",
        row_number().over(byQuery.orderBy(desc("sim"), asc("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Persist a built index: assignments as ordinary (bucketable)
    * parquet, centroids as the tiny sidecar table. This is the
    * production lifecycle — the KMeans fit + corpus assignment run
    * ONCE per snapshot, every later query batch loads the index and
    * pays only the probed-cell scans. At 100 TB the assignments table
    * is the corpus plus one int column; writing it `partitionBy`/
    * bucketed on `cluster` makes every probe a pruned read
    * (the [[graft.sources.SortedLayout]] pattern). */
  def save(index: Index, path: String): Unit = {
    index.assignments.write.mode("overwrite").parquet(s"$path/assignments")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index. The assignments side is persisted in
    * memory like [[buildIndex]]'s output (search consumes it on both
    * sides of its join); callers release it via
    * `index.assignments.unpersist()`. */
  def load(spark: SparkSession, path: String): Index = Index(
    spark.read.parquet(s"$path/assignments").persist(),
    spark.read.parquet(s"$path/centroids"))

  /** One-shot convenience used by the gate query: builds the index,
    * materializes the (small) result eagerly, and releases the cached
    * corpus assignments — the same checkpoint-then-unpersist lifecycle
    * SemDedup uses. Callers holding their own [[Index]] across many
    * `search` calls manage the cache themselves via
    * `index.assignments.unpersist()` when done. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 5,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = buildIndex(embeddings, nlist)
    val out = search(idx, queryIds, k, nprobe).localCheckpoint(true)
    idx.assignments.unpersist()
    out
  }
}
