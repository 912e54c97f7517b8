package graft.examples

import graft.core._
import graft.operators.{Dedup, VersionedTables}
import graft.operators.VersionedTables._
import graft.streaming.StreamingCorpusDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic skew probe for the ingestion + clustering paths (round-6 task:
 * turn the 100 TB skew claims for `acceptBatch`/`dupClusters` — previously
 * shape analysis at 500 docs — into MEASURED behavior at 50k docs with a
 * planted pathology). Not a driver query: a builder-side experiment whose
 * numbers land in SCALE.md.
 *
 * Corpus (deterministic, seeded): ~50k docs =
 *   - 45k unique filler docs (word soup keyed by id — no near-dups),
 *   - 5k-member BOILERPLATE MEGA-CLUSTER: identical 40-word template with a
 *     one-token suffix tweak every 100 docs, so shingle Jaccard >= ~0.9
 *     across the whole block — one connected component of 5,000, and every
 *     member hashes into the SAME LSH band buckets (the hot band: one
 *     (band, band_hash) key carrying 5k of 50k rows = 10% of the corpus in
 *     one join key).
 *
 * Measurements printed as NAME=value lines:
 *   GUARD_TRIP        maxClusterSize=1000 fails loudly naming the giant
 *   CLUSTER_* / HOT_* mega-cluster clustered with the cap lifted
 *   AQE_SKEW_READS    whether AQE split skewed shuffle partitions
 *   INGEST_*          acceptBatch of a 2.5k batch (half mega) against a
 *                     47.5k-doc persisted index
 */
object SkewProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic word soup: doc `i` gets `len` words whose identity mixes
    * the id through TWO coprime moduli (9973 and 9931) — one modulus alone
    * aliases ids 9973 apart into IDENTICAL texts (the first probe run found
    * exactly that: 9,974 "clusters"), two give a ~99M-id period, so every id
    * in range yields a genuinely distinct text and the only near-dups are
    * the planted ones. */
  private def fillerText(idCol: String, len: Int) =
    concat_ws(" ", (0 until len).map(k =>
      concat(lit("w"),
        pmod(col(idCol) * 2654435761L + lit(k) * 40503L + lit(k * k), lit(9973)).cast("string"),
        lit("x"),
        pmod(col(idCol) * 1103515245L + lit(k) * 12345L, lit(9931)).cast("string"))): _*)

  private def corpus(spark: SparkSession, nFiller: Int, nMega: Int): DataFrame = {
    val filler = spark.range(0, nFiller.toLong)
      .select(col("id").as("doc_id"), fillerText("id", 60).as("text"))
    // 40-word boilerplate template; one trailing token varies per 100-doc
    // stripe — well above any 0.8-Jaccard threshold corpus-wide
    val template = (0 until 40).map(k => s"tpl$k").mkString(" ")
    val mega = spark.range(nFiller.toLong, (nFiller + nMega).toLong)
      .select(col("id").as("doc_id"),
        concat(lit(template + " variant"), (col("id") / 100).cast("long").cast("string")).as("text"))
    filler.union(mega)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      // AQE on (the default) — the probe OBSERVES its skew handling
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nFiller = 45000
    val nMega = 5000
    val docs = corpus(spark, nFiller, nMega).localCheckpoint()
    println(s"CORPUS_DOCS=${docs.count()}")

    // ---- hot-band audit: how skewed is the LSH bucket distribution? ----
    val sigs = StreamingCorpusDedup.bandedSignatures(docs)
    val buckets = sigs.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(3).collect()
    println("HOT_BUCKETS=" + buckets.map(r => s"${r.getLong(2)}").mkString(","))

    // ---- pair mining + clustering with the guard ON: must trip loudly ----
    val pairs = Dedup.minhashNearDupPairs(docs).localCheckpoint()
    println(s"PAIRS=${pairs.count()}")
    val guard = try {
      Dedup.dupClusters(pairs, maxClusterSize = Some(1000)).count()
      "NO_TRIP"
    } catch {
      case e: IllegalArgumentException if e.getMessage.contains("maxClusterSize") =>
        "TRIPPED(" + e.getMessage.linesIterator.next().take(80) + "...)"
    }
    println(s"GUARD_TRIP=$guard")

    // ---- cap lifted: cluster the mega-component, observe AQE ----
    // inspect the plan BEFORE checkpointing: localCheckpoint truncates
    // lineage, leaving nothing of the join to read (first-run lesson)
    val (clusters, tCluster) = time {
      val c = Dedup.dupClusters(pairs)
      c.count()
      c
    }
    // AQE skew handling on the members-x-sizes join: count skew-split
    // shuffle reads in the executed (AQE-final) plan
    val plan = clusters.queryExecution.executedPlan.toString
    println(s"AQE_SKEW_READS=${plan.linesIterator.count(l => l.contains("skewed") || l.contains("Skew"))}")
    println("CLUSTER_JOIN_KINDS=" + List("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(j => s"$j:${plan.sliding(j.length).count(_ == j)}").mkString(","))
    val snap = clusters.localCheckpoint()
    val top = snap.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(1).collect()(0)
    println(f"CLUSTER_SECONDS=$tCluster%.1f")
    println(s"CLUSTER_LARGEST=${top.getLong(1)}")
    println(s"CLUSTER_COUNT=${snap.select("cluster_id").distinct().count()}")

    // same clustering with AQE's skew thresholds dropped to toy scale: at
    // 50k docs no partition reaches the default 256 MB skew trigger, so this
    // run demonstrates the MECHANISM engages on these plan shapes (groupBy +
    // join — splittable) rather than the thresholds happening to trip
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    val (clustersF, tClusterF) = time {
      val c = Dedup.dupClusters(pairs)
      c.count()
      c
    }
    val planF = clustersF.queryExecution.executedPlan.toString
    println(s"AQE_SKEW_READS_FORCED=${planF.linesIterator.count(l => l.contains("skewed") || l.contains("Skew"))}")
    println(f"CLUSTER_SECONDS_FORCED=$tClusterF%.1f")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")

    // ---- ingestion: 47.5k-doc index, 2.5k batch (half of it mega-dups) ----
    val root = java.nio.file.Files.createTempDirectory("graft-skewprobe-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    def tdef(name: String) = TableDefinition(TableName("probe", name),
      root.resolve(name).toUri, PartitionSchema(StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
    val docsT = tdef("docs"); val idxT = tdef("idx")
    engine.initTable(docsT, UserId("probe"), "init")
    engine.initTable(idxT, UserId("probe"), "init")
    // seed: 45k filler + 2.5k mega accepted as the standing corpus
    val seed = docs.filter(col("doc_id") < (nFiller + nMega / 2).toLong)
    val (seedAccepted, tSeed) = time {
      StreamingCorpusDedup.acceptBatch(seed, engine, docsT, idxT, "seed", UserId("probe"))
    }
    println(f"INGEST_SEED_ACCEPTED=$seedAccepted INGEST_SEED_SECONDS=$tSeed%.1f")
    // delivery: 1.25k fresh filler + the OTHER 2.5k mega docs (all near-dups
    // of the standing corpus through the hot band — the worst-case delivery)
    val fresh = spark.range((nFiller + nMega).toLong, (nFiller + nMega + 1250).toLong)
      .select(col("id").as("doc_id"), fillerText("id", 60).as("text"))
    val delivery = docs.filter(col("doc_id") >= (nFiller + nMega / 2).toLong).union(fresh)
    val (accepted, tBatch) = time {
      StreamingCorpusDedup.acceptBatch(delivery, engine, docsT, idxT, "d1", UserId("probe"))
    }
    println(f"INGEST_BATCH_IN=${2500 + 1250} INGEST_BATCH_ACCEPTED=$accepted INGEST_BATCH_SECONDS=$tBatch%.1f")

    spark.stop()
  }
}
