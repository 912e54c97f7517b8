package graft.operators

import graft.TestSpark
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files

class VectorIndexSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  private def newIndexTable(): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-ivf-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "ivf"), new File(dir, "ivf").toURI,
      VectorIndex.indexSchema, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    (engine, table)
  }

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  behavior of "VectorIndex (versioned IVF)"

  it should "build a cell-partitioned index and answer queries with solid recall" in {
    val (engine, table) = newIndexTable()
    VectorIndex.buildIvf(engine, table, emb, nlist = 8, userId = UserId("t"))

    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = VectorIndex.queryIvf(engine, table, queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & viaIndex).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF-index recall unexpectedly low: $recall")
  }

  it should "list only the probed cells' files (partition pruning IS the inverted file)" in {
    val (engine, table) = newIndexTable()
    VectorIndex.buildIvf(engine, table, emb, nlist = 8, userId = UserId("t"))
    val allFiles = engine.read(table).inputFiles.length
    val oneProbe = VectorIndex.queryIvf(engine, table, emb.filter(col("vec_id") === 0),
      k = 3, nprobe = 1)
    // candidate scan touches 1 data cell + the centroid partition; the full
    // index has 8 data cells + centroids
    oneProbe.inputFiles.length should be < allFiles
    oneProbe.count() shouldBe 3
  }

  it should "version rebuilds atomically and keep old index versions queryable" in {
    val (engine, table) = newIndexTable()
    VectorIndex.buildIvf(engine, table, emb, nlist = 4, userId = UserId("t"), message = "v1")
    val v1 = engine.log(table.name).head.id
    val q = emb.filter(col("vec_id") < 4)
    val r1 = VectorIndex.queryIvf(engine, table, q, k = 3)
      .select("query_id", "neighbor_id").collect().toSet

    // rebuild with different geometry — a new version, atomically visible
    VectorIndex.buildIvf(engine, table, emb, nlist = 8, userId = UserId("t"), message = "v2")
    engine.log(table.name).head.id should not be v1
    VectorIndex.queryIvf(engine, table, q, k = 3).count() shouldBe r1.size.toLong

    // time travel: the OLD index version (including its centroids) still answers
    val r1again = VectorIndex.queryIvf(engine, table, q, k = 3, at = Some(v1))
      .select("query_id", "neighbor_id").collect().toSet
    r1again shouldBe r1
  }

  it should "not leak cells from a previous geometry into a shrunk rebuild" in {
    val (engine, table) = newIndexTable()
    VectorIndex.buildIvf(engine, table, emb, nlist = 8, userId = UserId("t"), message = "wide")
    val before = engine.read(table).count()
    // shrink: nlist=2 writes far fewer cell partitions; replace-all must
    // remove the wide build's cells so no vector appears twice
    VectorIndex.buildIvf(engine, table, emb, nlist = 2, userId = UserId("t"), message = "narrow")
    val ids = engine.read(table).filter(col("cell") =!= VectorIndex.CentroidCell)
      .select("vec_id").collect().map(_.getLong(0))
    ids.length shouldBe ids.distinct.length // every vector exactly once
    ids.length.toLong shouldBe emb.count()
    // the wide build remains fully readable via time travel
    val commits = engine.log(table.name).reverse
    engine.readAt(table, commits(1).id).count() shouldBe before
  }

  it should "append batches that are EXACTLY equivalent to a rebuild with the same centroids" in {
    val (engine, table) = newIndexTable()
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val centroids = Similarity.learnCentroids(emb, 8, 2048, "vec_id", "embedding")
    VectorIndex.buildIvf(engine, table, base, userId = UserId("t"),
      precomputedCentroids = Some(centroids))
    val beforeFiles = engine.read(table).inputFiles.toSet
    VectorIndex.addBatch(engine, table, batch, "b1", userId = UserId("t"))
    // append is O(batch): every pre-append file survives untouched
    engine.read(table).inputFiles.toSet should contain allElementsOf beforeFiles

    // the equivalence law: appended index == full rebuild, same centroids
    val (engine2, table2) = newIndexTable()
    VectorIndex.buildIvf(engine2, table2, emb, userId = UserId("t"),
      precomputedCentroids = Some(centroids))
    val q = emb.filter(col("vec_id") < 8)
    def results(e: VersionedTables, t: TableDefinition) =
      VectorIndex.queryIvf(e, t, q, k = 5, nprobe = 4)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    results(engine, table) shouldBe results(engine2, table2)

    // compaction folds the batches and preserves the same results
    VectorIndex.compactBatches(engine, table, userId = UserId("t"))
    results(engine, table) shouldBe results(engine2, table2)
    engine.read(table).select("batch").distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("compacted")
  }

  it should "refuse a reused batch label and a drifted batch, loudly" in {
    val (engine, table) = newIndexTable()
    val spark2 = spark
    import spark2.implicits._
    // cluster-structured corpus: the guard compares distance-to-centroid
    // distributions, which only carries signal when the centroids actually
    // COVER the indexed data (on isotropic noise every direction is equally
    // far). Four tight clusters around orthogonal axes.
    def cluster(axis: Int, ids: Range): Seq[(Long, Seq[Float])] = ids.map { i =>
      val v = Array.fill(8)(0.01f * (i % 7))
      v(axis) = 1.0f
      (i.toLong, v.toSeq)
    }
    val base = (cluster(0, 0 until 50) ++ cluster(1, 50 until 100) ++
      cluster(2, 100 until 150) ++ cluster(3, 150 until 200))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    VectorIndex.buildIvf(engine, table, base, nlist = 4, userId = UserId("t"))
    VectorIndex.addBatch(engine, table,
      cluster(1, 1000 until 1016).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      "b1", userId = UserId("t"))
    // label reuse would silently overwrite that delivery's partitions
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.addBatch(engine, table, base.limit(5), "b1", userId = UserId("t"))
    }
    e1.getMessage should include("already exists")

    // a batch from an UNSEEN cluster (axis 7 — far from every centroid)
    // trips the drift guard: stale centroids for this data
    val farDf = cluster(7, 2000 until 2016).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.addBatch(engine, table, farDf, "b2", userId = UserId("t"))
    }
    e2.getMessage should include("drift")
    // the refusal names the orphaned staged version so operators can vacuum
    e2.getMessage should include("_version=")
    e2.getMessage should include("vacuum")
    // disabling the guard lets a deliberate append through
    VectorIndex.addBatch(engine, table, farDf, "b2",
      maxDriftFactor = Double.PositiveInfinity, userId = UserId("t"))
    engine.read(table).filter(col("vec_id") >= 2000L).count() shouldBe 16

    // an EMPTY batch refuses loudly at the zero-row stage guard — it must
    // never silently pass the drift guard off a null observation (the
    // fused-write observation yields no batch_mean for zero rows)
    val e3 = intercept[IllegalArgumentException] {
      VectorIndex.addBatch(engine, table, farDf.limit(0), "b3", userId = UserId("t"))
    }
    e3.getMessage should include("no rows")
    engine.read(table).select("batch").distinct().collect()
      .map(_.getString(0)).toSet should not contain "b3"
  }

  it should "reject tables not partitioned by cell" in {
    val dir = Files.createTempDirectory("graft-ivf-bad-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val bad = TableDefinition(TableName("test", "bad"), new File(dir, "bad").toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(bad, UserId("t"), "init")
    an[IllegalArgumentException] should be thrownBy
      VectorIndex.buildIvf(engine, bad, emb)
  }
}
