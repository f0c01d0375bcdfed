package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Restart persistence of trained ANN artifacts: IVF centroids and PQ
  * codebooks live behind digest-keyed saved tables, so a fresh session
  * MOUNTS them instead of retraining — and a regenerated corpus
  * (changed filesystem fingerprint) invalidates the saved artifact
  * and forces a retrain instead of serving stale geometry. */
class AnnPersistSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("fresh session mounts saved centroids/codebooks; results bit-identical") {
    try {
      Similarity.clearArtifactMemos()
      Similarity.dropArtifacts(spark, d)
      val ivf1 = Similarity.qKnnIvf(spark, d).collect().toSeq
      val pq1 = Similarity.qKnnPq(spark, d).collect().toSeq
      val centTable =
        Similarity.annTableName(s"ivf${Similarity.KMeansIters}", d)
      assert(spark.catalog.tableExists(centTable),
        "training must leave a saved centroid table behind")
      assert(spark.catalog.tableExists(Similarity.annTableName("pq0", d)),
        "training must leave saved PQ codebook tables behind")

      // simulated restart: forget the JVM memos; a NEW session (own
      // session state, shared catalog — the warehouse survives a real
      // restart the same way) must reproduce both searches bit-for-bit
      Similarity.clearArtifactMemos()
      val s2 = spark.newSession()
      assert(Similarity.qKnnIvf(s2, d).collect().toSeq == ivf1,
        "mounted centroids must reproduce q_knn_ivf bit-for-bit")
      assert(Similarity.qKnnPq(s2, d).collect().toSeq == pq1,
        "mounted codebooks must reproduce q_knn_pq bit-for-bit")

      // prove the mount path is a READ, not a silent retrain: tamper
      // the saved centroid ids; a mounting reader must surface the
      // tampered ids, a retrainer would restore the originals
      val rows = spark.table(centTable).collect().toSeq
      val tampered = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r.getLong(0) + 100000L, r.get(1), r.get(2), r.get(3)))),
        spark.table(centTable).schema)
      graft.sources.Writers.replaceTable(spark, tampered, centTable)
      Similarity.clearArtifactMemos()
      val mountedIds = Similarity.qKmeansCentroids(spark, d)
        .select(col("cent_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(mountedIds.forall(_ >= 100000L),
        s"expected tampered (mounted) centroid ids, got $mountedIds — " +
          "the artifact was retrained instead of mounted")
    } finally {
      Similarity.clearArtifactMemos()
      Similarity.dropArtifacts(spark, d)
    }
  }

  test("fresh session mounts the saved PCA basis; results bit-identical") {
    try {
      Similarity.clearArtifactMemos()
      Similarity.dropArtifacts(spark, d)
      val basis1 = Similarity.qPcaBasis(spark, d).collect().toSeq
      val pcaTable = Similarity.annTableName("pca", d)
      assert(spark.catalog.tableExists(pcaTable),
        "training must leave a saved PCA basis table behind")
      // simulated restart: the mounted basis must reproduce the family
      // bit-for-bit without re-running the power chains
      Similarity.clearArtifactMemos()
      val s2 = spark.newSession()
      assert(Similarity.qPcaBasis(s2, d).collect().toSeq == basis1,
        "mounted basis must reproduce q_pca_basis bit-for-bit")
      // mount-not-retrain proof (centroid-test convention): tamper the
      // saved component ids; a mounting reader surfaces them
      val rows = spark.table(pcaTable).collect().toSeq
      val tampered = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r.getLong(0) + 100L, r.get(1), r.get(2), r.get(3), r.get(4)))),
        spark.table(pcaTable).schema)
      graft.sources.Writers.replaceTable(spark, tampered, pcaTable)
      Similarity.clearArtifactMemos()
      val comps = Similarity.qPcaBasis(spark, d)
        .select(col("comp")).distinct().collect().map(_.getLong(0)).toSet
      assert(comps.forall(_ >= 100L),
        s"expected tampered (mounted) comp ids, got $comps — " +
          "the artifact was retrained instead of mounted")
    } finally {
      Similarity.clearArtifactMemos()
      Similarity.dropArtifacts(spark, d)
    }
  }

  test("a changed corpus fingerprint invalidates the artifact and retrains") {
    val tmp = Files.createTempDirectory("graft-ann-fp")
    val dir = tmp.toString
    try {
      Files.copy(Paths.get(d, "embeddings.parquet"),
        Paths.get(dir, "embeddings.parquet"), StandardCopyOption.COPY_ATTRIBUTES)
      val trained = Similarity.qKmeansCentroids(spark, dir).collect().toSeq
      // tamper the saved table, then CHANGE the corpus fingerprint: the
      // stale artifact must be ignored and retraining must restore the
      // honest centroids
      val centTable =
        Similarity.annTableName(s"ivf${Similarity.KMeansIters}", dir)
      val rows = spark.table(centTable).collect().toSeq
      val tampered = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r.getLong(0) + 100000L, r.get(1), r.get(2), r.get(3)))),
        spark.table(centTable).schema)
      graft.sources.Writers.replaceTable(spark, tampered, centTable)
      val f = Paths.get(dir, "embeddings.parquet").toFile
      assert(f.setLastModified(f.lastModified() + 60000L))
      Similarity.clearArtifactMemos()
      assert(Similarity.qKmeansCentroids(spark, dir).collect().toSeq == trained,
        "a fingerprint mismatch must force a retrain, not serve the stale table")
    } finally {
      Similarity.clearArtifactMemos()
      Similarity.dropArtifacts(spark, tmp.toString)
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
    }
  }
}
