package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline query surface: text analysis, deduplication (exact /
 * MinHash / SimHash / n-gram Jaccard), embedding similarity search, and
 * multimodal feature extraction — over the `documents` and `embeddings`
 * tables. Everything is DuckDB-oracled except the two genuinely
 * non-replayable sketches (HLL approx-distinct, xxhash64-seeded SimHash),
 * which are rows-only here and pinned by exact unit specs in
 * DedupSpec/SimilaritySpec.
 */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Embedding width baked into the q_ann_lsh oracle's weight-table literals;
    * the Spark-side query asserts the fixture still has this width. */
  private val OracleLshDims = 64

  /** Vocab-normalized content hash: docs with identical word sets collapse.
    * Shared by the dedup and curation queries (SQL mirror: `vocabHashSql`). */
  private def vocabHash: org.apache.spark.sql.Column =
    md5(concat_ws(" ", array_sort(wordSet(col("text")))))

  /** The ngram-jaccard near-dup pair set feeds three queries (pair mining,
    * clustering, corpus dedup) — mine it once per (session, sfDir) and share
    * the materialized frame, exactly like the versioned fixture. */
  private val pairsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def ngramPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.computeIfAbsent((s, d), _ =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), threshold = 0.8,
        blockCol = Some("source")).localCheckpoint())

  /** The MinHash-LSH near-dup pair set feeds three queries (pair mining, LSH
    * clustering, LSH corpus dedup) — mined once per (session, sfDir). This is
    * THE 100 TB dedup path: banded LSH candidates + exact verify, never
    * quadratic in the corpus. */
  private val lshPairsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def lshPairs(s: SparkSession, d: String): DataFrame =
    lshPairsCache.computeIfAbsent((s, d), _ =>
      Dedup.minhashNearDupPairs(Tables.documents(s, d), threshold = 0.8).localCheckpoint())

  /**
   * Learned IVF centroids for the CURRENT verify run, registered when an IVF
   * query executes. `Similarity.learnCentroids` is deterministic (fixed
   * sample, seeded k-means), so the values registered here are exactly the
   * centroids both `ivfTopK` and `VectorIndex.buildIvf` derive internally —
   * and [[oracles]] (a def, read AFTER the queries ran) embeds them as DuckDB
   * literals, turning the whole IVF path (assignment, probing, ranking) into
   * an exact SQL replay, the same trick as the q_ann_lsh weight table.
   */
  private val ivfCentroidCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Array[Array[Float]]]()

  /** Learn (once per dataset) the centroids; the cache doubles as the oracle
    * registry — see [[soleRegistered]]. */
  private def ivfCentroids(s: SparkSession, d: String): Array[Array[Float]] =
    ivfCentroidCache.computeIfAbsent((s, d), _ =>
      Similarity.learnCentroids(Tables.embeddings(s, d), nlist = 16))

  /**
   * Distinct (token, 64-bit hash) dictionary of the corpus, registered when
   * q_dedup_simhash runs — same mechanism as the IVF centroids. The corpus
   * vocabulary is tiny (31 distinct tokens), so the whole hash function
   * RESTRICTED TO THIS CORPUS fits in a SQL VALUES literal, and DuckDB can
   * replay the entire SimHash computation (per-occurrence bit votes, 64-bit
   * signature, Hamming pairing) exactly. Hashes come from the same
   * WordShingleHashes kernel the query uses, evaluated per single token.
   */
  private val simhashDictCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Array[(String, Long)]]()

  private def simhashDict(s: SparkSession, d: String): Array[(String, Long)] =
    simhashDictCache.computeIfAbsent((s, d), _ =>
      Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .distinct()
        .select(col("tok"), element_at(
          graft.functions.VectorExpressions.wordShingleHashes(col("tok"), 1, distinct = false), 1).as("h"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1))))

  /** DSIR weight table (token → milli-nat log-ratio, target = English docs),
    * registered when q_dsir_weight runs — the integer weights are rounded
    * ONCE driver-side, so the oracle replays the scoring as a pure integer
    * fold. Same registry mechanism as the SimHash dictionary. */
  private val dsirWeightCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Map[String, Long]]()

  private def dsirWeights(s: SparkSession, d: String): Map[String, Long] =
    dsirWeightCache.computeIfAbsent((s, d), _ =>
      graft.operators.CorpusTools.importanceWeightTable(
        Tables.documents(s, d), "text", col("lang") === "en"))

  /** BM25 query terms for q_bm25_search: two common terms plus the corpus's
    * one rare token, so the idf table actually discriminates. */
  private val Bm25Terms = Seq("hash", "join", "dup")
  private val Bm25K = 50

  /** BM25 corpus stats (doc count, total tokens, per-term df), registered
    * when q_bm25_search runs — the idf table and shared double constants are
    * derived from these ONCE driver-side, so the oracle replays the exact
    * same literal chain. Same registry mechanism as the DSIR weights. */
  private val bm25StatsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), graft.operators.TextSearch.Bm25Stats]()

  private def bm25Stats(s: SparkSession, d: String): graft.operators.TextSearch.Bm25Stats =
    bm25StatsCache.computeIfAbsent((s, d), _ =>
      graft.operators.TextSearch.bm25Stats(Tables.documents(s, d), "doc_id", "text", Bm25Terms))

  /** CCNet LM model + tertile thresholds (reference slice = English docs),
    * registered when q_lm_perplexity runs — model table and the two
    * threshold integers are all the oracle needs. */
  private val lmCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.operators.QualityModels.LmModel, Long, Long)]()

  private def lmModel(s: SparkSession, d: String): (graft.operators.QualityModels.LmModel, Long, Long) =
    lmCache.computeIfAbsent((s, d), _ => {
      val docs = Tables.documents(s, d)
      val m = graft.operators.QualityModels.lmCostTable(docs, "text", col("lang") === "en")
      val scored = graft.operators.QualityModels.lmPerplexity(docs, "doc_id", "text", m)
      val (t1, t2) = graft.operators.QualityModels.tertileThresholds(scored, "doc_id")
      (m, t1, t2)
    })

  /** Bigram LM (same reference slice), registered when q_lm_bigram runs —
    * the order-sensitive rung of the CCNet ladder. */
  private val lm2Cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), graft.operators.QualityModels.LmModel]()

  private def lm2Model(s: SparkSession, d: String): graft.operators.QualityModels.LmModel =
    lm2Cache.computeIfAbsent((s, d), _ =>
      graft.operators.QualityModels.lmCostTable(
        Tables.documents(s, d), "text", col("lang") === "en", ngram = 2))

  /** Naive Bayes language model (labels = the corpus lang column),
    * registered when q_nb_classify runs. */
  private val nbCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), graft.operators.QualityModels.NbModel]()

  private def nbModel(s: SparkSession, d: String): graft.operators.QualityModels.NbModel =
    nbCache.computeIfAbsent((s, d), _ =>
      graft.operators.QualityModels.nbTrain(Tables.documents(s, d), "lang", "text"))

  /** The single data-derived value registered this JVM, or None when queries
    * ran against MORE than one sfDir — an oracle would then embed literals
    * from one corpus and be replayed against another, degrading silently, so
    * the queries fall back to the rows-only check instead. (Verify runs one
    * sfDir per process; values are deterministic per sfDir, so multiple
    * sessions over the same dir agree.) */
  private def soleRegistered[V](
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]): Option[V] = {
    import scala.jdk.CollectionConverters._
    val byDir = cache.asScala.toList.map { case ((_, dir), v) => dir -> v }.toMap
    if (byDir.size == 1) Some(byDir.head._2) else None
  }
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.operators.VersionedTables, graft.core.TableDefinition)]()

  private def ivfFixture(s: SparkSession, d: String)
      : (graft.operators.VersionedTables, graft.core.TableDefinition) =
    ivfCache.computeIfAbsent((s, d), _ => {
      import graft.core._
      graft.Tables.prepare(s)
      val root = graft.FixtureTempDirs.create("graft-ivf-q-")
      val engine = graft.operators.VersionedTables.withFileStore(s, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "ivf_index"),
        root.resolve("ivf").toUri, graft.operators.VectorIndex.indexSchema, FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      graft.operators.VectorIndex.buildIvf(engine, table, graft.Tables.embeddings(s, d),
        nlist = 16, userId = UserId("driver"),
        precomputedCentroids = Some(ivfCentroids(s, d)))
      (engine, table)
    })

  /** The INCREMENTALLY-built twin of [[ivfFixture]]: base build over
    * `vec_id % 5 != 0`, the remaining fifth appended via
    * [[graft.operators.VectorIndex.addBatch]] against the pinned centroids.
    * Same registered centroids, so the full-corpus oracle replay applies
    * unchanged. */
  private val ivfAppendCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.operators.VersionedTables, graft.core.TableDefinition)]()

  private def ivfAppendFixture(s: SparkSession, d: String)
      : (graft.operators.VersionedTables, graft.core.TableDefinition) =
    ivfAppendCache.computeIfAbsent((s, d), _ => {
      import graft.core._
      graft.Tables.prepare(s)
      val root = graft.FixtureTempDirs.create("graft-ivf-append-q-")
      val engine = graft.operators.VersionedTables.withFileStore(s, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "ivf_index_append"),
        root.resolve("ivf").toUri, graft.operators.VectorIndex.indexSchema, FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      val emb = graft.Tables.embeddings(s, d)
      val t0 = System.nanoTime()
      graft.operators.VectorIndex.buildIvf(engine, table,
        emb.filter(col("vec_id") % 5 =!= 0), nlist = 16, userId = UserId("driver"),
        precomputedCentroids = Some(ivfCentroids(s, d)))
      val t1 = System.nanoTime()
      graft.operators.VectorIndex.addBatch(engine, table,
        emb.filter(col("vec_id") % 5 === 0), "delivery-1", userId = UserId("driver"))
      val t2 = System.nanoTime()
      FixturePhases.record(s, "q_ann_ivf_append", Seq(
        "build_base" -> (t1 - t0) / 1e9, "add_batch" -> (t2 - t1) / 1e9))
      (engine, table)
    })

  /** Versioned BM25 postings index of the documents corpus, built + one
    * incremental batch appended ONCE per (session, sfDir): the first 400
    * docs are the base build, the rest arrive via addBatch — so the gate
    * query exercises the full incremental path, not just a fresh build.
    * Same fixture-cache mechanism as the IVF index above. */
  private val textIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.operators.VersionedTables, graft.core.TableDefinition)]()

  private def textIndexFixture(s: SparkSession, d: String)
      : (graft.operators.VersionedTables, graft.core.TableDefinition) =
    textIndexCache.computeIfAbsent((s, d), _ => {
      import graft.core._
      graft.Tables.prepare(s)
      // Phase-timed like the LSH fixture below: docs_s is the one-time
      // localCheckpoint of the documents table, build_index_s the initial
      // postings build, add_batch_s the incremental CASed append.
      val t0 = System.nanoTime()
      val root = graft.FixtureTempDirs.create("graft-bm25-q-")
      val engine = graft.operators.VersionedTables.withFileStore(s, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "bm25_index"),
        root.resolve("postings").toUri, graft.operators.TextIndex.indexSchema, FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      val t1 = System.nanoTime()
      val docs = Tables.documents(s, d).localCheckpoint()
      val t2 = System.nanoTime()
      graft.operators.TextIndex.buildIndex(engine, table,
        docs.filter(col("doc_id") < 400), buckets = 16, userId = UserId("driver"))
      val t3 = System.nanoTime()
      graft.operators.TextIndex.addBatch(engine, table,
        docs.filter(col("doc_id") >= 400), batchLabel = "b1",
        userId = UserId("driver"))
      val t4 = System.nanoTime()
      FixturePhases.record(s, "q_bm25_index", Seq(
        "init_s" -> (t1 - t0) / 1e9,
        "docs_s" -> (t2 - t1) / 1e9,
        "build_index_s" -> (t3 - t2) / 1e9,
        "add_batch_s" -> (t4 - t3) / 1e9))
      (engine, table)
    })

  /** Versioned LSH band-signature index of the corpus side (doc_id < 250),
    * built ONCE per (session, sfDir) — the persisted ingestion-dedup
    * artifact that lets every later delivery dedup against the lake with
    * one index scan instead of re-hashing the corpus text. Same band
    * parameters as every LSH path, so collisions are identical; same
    * fixture-cache mechanism as the IVF index above. */
  private val lshIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.operators.VersionedTables, graft.core.TableDefinition)]()

  private def lshIndexFixture(s: SparkSession, d: String)
      : (graft.operators.VersionedTables, graft.core.TableDefinition) =
    lshIndexCache.computeIfAbsent((s, d), _ => {
      import graft.core._
      import graft.operators.VersionedTables._
      graft.Tables.prepare(s)
      // Phase-timed (round 9): the signature compute (shingle -> minhash ->
      // band over the corpus text) is materialized by localCheckpoint before
      // the versioned write, so `signatures_s` isolates the CPU-bound minhash
      // work from the parquet write + commit, and the bench artifact can
      // localize a hot build without a local replay.
      val t0 = System.nanoTime()
      val root = graft.FixtureTempDirs.create("graft-lshidx-q-")
      val engine = graft.operators.VersionedTables.withFileStore(s, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "lsh_index"),
        root.resolve("lshidx").toUri,
        PartitionSchema(graft.streaming.StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      val t1 = System.nanoTime()
      val sigs = graft.streaming.StreamingCorpusDedup.bandedSignatures(
          Tables.documents(s, d).filter(col("doc_id") < 250))
        .withColumn(graft.streaming.StreamingCorpusDedup.BatchCol, lit("0"))
        .localCheckpoint()
      val t2 = System.nanoTime()
      sigs.versionedInsertInto(engine, table, UserId("driver"), "index corpus")
      val t3 = System.nanoTime()
      FixturePhases.record(s, "q_dedup_against_index", Seq(
        "init_s" -> (t1 - t0) / 1e9,
        "signatures_s" -> (t2 - t1) / 1e9,
        "write_commit_s" -> (t3 - t2) / 1e9))
      (engine, table)
    })

  /** JSON object of the recorded build phases for `fixture` on session `s`,
    * if that fixture was built there — [[graft.Bench]] attaches it to the
    * fixture's entry in the `fixtures` block. */
  def fixturePhasesJson(s: SparkSession, fixture: String): Option[String] =
    FixturePhases.get(s, fixture).map(_.map { case (k, v) =>
      f""""$k":$v%.3f""" }.mkString("{", ",", "}"))

  val defs: Map[String, Q] = Map(
    // --- text analysis ---
    "q_text_stats" -> ((s, d) => {
      // fused path: ONE TextStats pass per row computes every count. No
      // barrier needed: CollapseProject only inlines CHEAP multiply-referenced
      // producers, so the struct stays a single evaluation feeding the 11
      // field references (verified: one text_stats( in the optimized plan).
      // Composed equivalents (tokenCount/langId/qualityScore/...) are the
      // semantic reference, pinned equal in TextFunctionsSpec.
      val stats = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), textStats(col("text")).as("st"))
      val st = col("st")
      stats.select(
        col("doc_id"), col("lang"),
        st.getField("n_tokens").as("n_tokens"),
        st.getField("n_punct").as("n_punct"),
        st.getField("sw_en").as("sw_en"),
        st.getField("sw_es").as("sw_es"),
        st.getField("sw_de").as("sw_de"),
        st.getField("sw_fr").as("sw_fr"),
        langIdFromStats(st).as("lang_pred"),
        meanWordLengthFromStats(st).as("mean_word_len"),
        qualityScoreFromStats(st).as("quality"))
    }),

    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpeish_tokens"))),

    "q_doc_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        docFingerprint(col("text")).as("content_md5"),
        minShingleFingerprint(col("text")).as("min_shingle_md5"))),

    // --- dedup ---
    "q_dedup_exact" -> ((s, d) => {
      // exact dedup under word-set normalization: docs with identical
      // vocabulary collapse; keep the lowest doc_id
      val docs = Tables.documents(s, d).withColumn("vocab_hash", vocabHash)
      Dedup.exactDedup(docs, idCol = "doc_id", textCol = "vocab_hash")
        .select("doc_id", "vocab_hash", "lang", "source")
    }),

    "q_dedup_ngram_jaccard" -> ((s, d) => ngramPairs(s, d)),

    // exact-duplicate GROUPS (content hash -> group size + canonical id):
    // the reporting twin of q_dedup_exact's keep-lowest filter
    "q_dedup_groups" -> ((s, d) =>
      Dedup.exactDupGroups(
        Tables.documents(s, d).withColumn("vocab_hash", vocabHash),
        idCol = "doc_id", textCol = "vocab_hash")),

    "q_dedup_minhash" -> ((s, d) => lshPairs(s, d)),

    // THE 100 TB dedup pipeline, end-to-end as one driver query: LSH-mined
    // pairs (banded MinHash + exact verify, never corpus-quadratic) ->
    // connected components -> canonical min-id labels. Oracled: the LSH pair
    // set equals the exact 3-gram shingle-Jaccard ground truth on this
    // fixture (verified 0-diff at sf0.001/0.01/0.1), which DuckDB mines
    // directly and closes with a recursive CTE.
    "q_dedup_clusters_lsh" -> ((s, d) => Dedup.dupClusters(lshPairs(s, d))),

    // ... -> keepCanonical: the survivors a corpus consumer actually keeps
    "q_dedup_corpus_lsh" -> ((s, d) =>
      Dedup.keepCanonical(Tables.documents(s, d), lshPairs(s, d))
        .select("doc_id", "lang", "source")),

    // pairs -> duplicate clusters: connected components over the (oracled)
    // ngram-jaccard pair graph; every pair-involved doc gets the canonical
    // min-id label of its component plus the component size
    "q_dedup_clusters" -> ((s, d) => Dedup.dupClusters(ngramPairs(s, d))),

    // benchmark contamination scan: which corpus docs contain >= 50% of a
    // "benchmark" doc's shingles (fixture benchmark = doc_id < 16, so the
    // self-matches prove detection end-to-end)
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationPairs(docs, docs.filter(col("doc_id") < 16), threshold = 0.5)
    }),

    // the matching cut arm: drop every corpus doc flagged by the scan above
    // (GPT-3-style decontamination; the planted benchmark slice removes
    // itself and any doc embedding it)
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.removeContaminated(docs, docs.filter(col("doc_id") < 16), threshold = 0.5)
        .select("doc_id", "lang", "source")
    }),

    // the end-to-end dedup a corpus consumer runs: keep one canonical doc
    // per near-dup cluster plus all unpaired docs
    "q_dedup_corpus" -> ((s, d) =>
      Dedup.keepCanonical(Tables.documents(s, d), ngramPairs(s, d))
        .select("doc_id", "lang", "source")),

    // batch-ingestion dedup: treat doc_id >= 250 as the NEW delivery and the
    // rest as the existing corpus. Cross pairs via banded LSH between the two
    // sides (one bucket equi-join, never |new|x|corpus|); oracled by the
    // ground-truth cross subset (LSH pair set == shingle ground truth on this
    // fixture, so any subset of it matches too)
    "q_dedup_cross" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.crossNearDupPairs(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250))
    }),

    // ...and the full composition a new-crawl delivery runs: drop new docs
    // already in the lake, then keep one canonical doc per in-batch cluster
    "q_dedup_against" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250))
        .select("doc_id", "lang", "source")
    }),

    // the SAME delivery dedup, but against the PERSISTED versioned
    // band-signature index (no corpus-text rescan): the batch face of the
    // streaming ingestion path, sharing its index artifact and therefore its
    // collisions. At 100 TB this is the shape that matters — re-hashing the
    // lake per delivery is the cost the index exists to delete. Result is
    // pinned identical to q_dedup_against (same oracle SQL).
    "q_dedup_against_index" -> ((s, d) => {
      val (engine, idxTable) = lshIndexFixture(s, d)
      graft.streaming.StreamingCorpusDedup.filterNovel(
          Tables.documents(s, d).filter(col("doc_id") >= 250),
          engine.read(idxTable).select("id", "hs", "band", "band_hash"))
        .select("doc_id", "lang", "source")
    }),

    "q_dedup_simhash" -> ((s, d) => {
      simhashDict(s, d) // register the corpus token-hash dictionary for the oracle
      Dedup.simhashNearDupPairs(Tables.documents(s, d), maxHamming = 3)
    }),

    // embedding-free text knn: hashing-trick TF vectors (dim 64, one native
    // pass) feed the standard cosine top-k — text becomes a first-class
    // citizen of every vector operator with no model in the loop. Counts
    // are exact integers in float, so the cosine chain replays bit-exactly
    // from the same registered token-hash dictionary the SimHash oracle uses
    "q_text_knn" -> ((s, d) => {
      simhashDict(s, d)
      val vecs = Tables.documents(s, d).select(col("doc_id").as("vec_id"),
        graft.functions.VectorExpressions.hashingTf(col("text"), 64).as("embedding"))
      Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 10)
    }),

    // per-source corpus composition report — the dashboard a curation run
    // ends with. One fused TextStats pass, one map-side-combinable
    // aggregate; every metric is an integer fold, so the report replays
    // hash-exactly across engines (a float mean would differ in the last
    // ulp between Spark's long→double and DuckDB's HUGEINT→double paths;
    // mean_tokens = total_tokens / n_docs is left to the reader)
    "q_corpus_report" -> ((s, d) => {
      val stats = Tables.documents(s, d)
        .select(col("source"), col("lang"), textStats(col("text")).as("st"))
      stats.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("st.n_tokens").cast("long")).as("total_tokens"),
        sum(col("st.n_punct").cast("long")).as("total_punct"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("st.n_tokens")).as("min_tokens"),
        max(col("st.n_tokens")).as("max_tokens"))
    }),

    // DSIR importance-resampling weights (published data-selection recipe):
    // target distribution = the English slice, raw = the whole corpus;
    // per-doc score = summed integer milli-nat log-ratios over its tokens,
    // kept = score >= 0 (more target-like than raw). The weight table is
    // data-derived and registered for the oracle like the SimHash dict.
    "q_dsir_weight" -> ((s, d) => {
      val w = dsirWeights(s, d)
      graft.operators.CorpusTools.importanceWeights(
        Tables.documents(s, d), "doc_id", "text", w, keepThreshold = 0L)
    }),

    // DSIR end-to-end: the paper's RESAMPLING step on top of the scores —
    // Gumbel-top-k sample-without-replacement of 100 docs ∝ exp(score),
    // with deterministic md5-derived Gumbel noise quantized to integer
    // milli-nats, so the selected set is a pure integer computation the
    // oracle replays exactly (same registered weight table as q_dsir_weight).
    "q_dsir_sample" -> ((s, d) => {
      val w = dsirWeights(s, d)
      graft.operators.CorpusTools.dsirSample(
        Tables.documents(s, d), "doc_id", "text", w, n = 100, seed = 42)
    }),

    // BM25 keyword retrieval (lexical search over the corpus): top-50 docs
    // for a 3-term query, integer micro-nat scores from a driver-quantized
    // idf table — stats registered for the exact oracle replay
    "q_bm25_search" -> ((s, d) => {
      val st = bm25Stats(s, d)
      graft.operators.TextSearch.bm25TopK(
        Tables.documents(s, d), "doc_id", "text", Bm25Terms, k = Bm25K, stats = Some(st))
    }),

    // CCNet-style perplexity bucketing: quantized unigram LM trained on the
    // English slice scores every doc (integer milli-nat cross-entropy);
    // head/middle/tail from registered tertile thresholds
    "q_lm_perplexity" -> ((s, d) => {
      val (m, t1, t2) = lmModel(s, d)
      graft.operators.QualityModels.lmBuckets(
        graft.operators.QualityModels.lmPerplexity(
          Tables.documents(s, d), "doc_id", "text", m), t1, t2)
    }),

    // bigram-LM scoring: the order-sensitive rung (a bag-of-words scramble
    // keeps its unigram score, loses this one); same broadcast-table shape,
    // units are space-joined word bigrams with the whole-text fallback for
    // docs under 2 tokens
    "q_lm_bigram" -> ((s, d) =>
      graft.operators.QualityModels.lmPerplexity(
        Tables.documents(s, d), "doc_id", "text", lm2Model(s, d), ngram = 2)),

    // Naive Bayes language routing: argmax of integer milli-nat label
    // scores, evaluated against the corpus's own lang labels
    "q_nb_classify" -> ((s, d) => {
      val m = nbModel(s, d)
      val docs = Tables.documents(s, d)
      graft.operators.QualityModels.nbClassify(docs, "doc_id", "text", m)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("predicted"), col("score_millinats"),
          (col("predicted") === col("lang")).as("correct"))
    }),

    // BM25 through the PERSISTED versioned postings index (base build + one
    // incremental batch): identical results to q_bm25_search by shared
    // arithmetic — one oracle, two plans, like q_dedup_against_index.
    // Registers the same stats so the oracle is available either way.
    "q_bm25_index" -> ((s, d) => {
      bm25Stats(s, d)
      val (engine, table) = textIndexFixture(s, d)
      graft.operators.TextIndex.search(engine, table, Bm25Terms, k = Bm25K)
    }),

    // hybrid retrieval: BM25 top-50 fused with IVF-cosine top-50 around
    // query vector 0 (embeddings.vec_id aligns with documents.doc_id) by
    // all-integer reciprocal-rank fusion — the window ranking both lists is
    // k-bounded, so the single-partition row_number is over 50 rows.
    // The vector arm is the PRODUCTION ANN shape (nprobe/nlist of the data
    // scanned, not all of it); the oracle replays the IVF path exactly via
    // the registered centroid literals — round 9 established that IVF and
    // brute-force top-50 genuinely differ on this corpus (7-14/20 fused rows
    // at the three gate scales), so the swap is oracled, not assumed.
    "q_hybrid_search" -> ((s, d) => {
      val st = bm25Stats(s, d)
      val lex = graft.operators.TextSearch.bm25TopK(
          Tables.documents(s, d), "doc_id", "text", Bm25Terms, k = Bm25K, stats = Some(st))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("score_micro").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, d)
      val vec = Similarity.ivfTopK(emb.filter(col("vec_id") === 0), emb, k = Bm25K,
          nlist = 16, nprobe = 4, precomputedCentroids = Some(ivfCentroids(s, d)))
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.TextSearch.rrfFuse(lex, vec, "doc_id", k = 20)
        .withColumnRenamed("rank_a", "lex_rank")
        .withColumnRenamed("rank_b", "vec_rank")
    }),

    // fuzzy entity matching: part names with one deterministic character
    // removed are matched back against the FULL catalog at edit distance <= 1
    // via the length-banded equi-join (never a cross join). The probe side is
    // capped at 1000 names: this fixture's tiny 31-word vocabulary makes
    // short names collide at a pathological rate (every same-length pair is
    // a near-candidate), which is exactly the situation the operator's
    // blockCols parameter exists for at real scale.
    "q_fuzzy_join" -> ((s, d) => {
      val part = Tables.part(s, d)
      val corrupted = part.filter(col("p_partkey") < 1000).selectExpr(
        "p_partkey AS c_id",
        "concat(substring(p_name, 1, pmod(p_partkey, length(p_name))), " +
          "substring(p_name, pmod(p_partkey, length(p_name)) + 2)) AS c_name")
      Dedup.editDistanceJoin(corrupted, part, "c_id", "c_name", "p_partkey", "p_name", maxDistance = 1)
        .withColumnRenamed("left_id", "c_id").withColumnRenamed("left_str", "c_name")
        .withColumnRenamed("right_id", "match_id").withColumnRenamed("right_str", "match_name")
    }),

    // --- similarity search ---
    "q_ann_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 16), emb, k = 10)
    }),

    "q_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // The DuckDB oracle embeds the hyperplane weight table for exactly
      // OracleLshDims-wide vectors as SQL literals, while lshTopK derives its
      // weights from the actual vector width — fail loudly here if the
      // fixture width ever drifts instead of letting the oracle desync.
      val width = emb.select(size(col("embedding"))).head().getInt(0)
      require(width == OracleLshDims,
        s"embeddings width $width != q_ann_lsh oracle dims $OracleLshDims — regenerate the oracle weight literals")
      Similarity.lshTopK(emb.filter(col("vec_id") < 16), emb, k = 10, planes = 8)
    }),

    "q_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 16), emb, k = 10, nlist = 16, nprobe = 4,
        precomputedCentroids = Some(ivfCentroids(s, d)))
    }),

    // recall@k of the IVF path against the exact baseline — the number a
    // pipeline tunes nprobe with. Both arms are the gate's own operators
    // (brute force = ground truth, IVF = the scale path); the join is on
    // (query, neighbor) membership, so rank order inside the top-k cannot
    // flip the answer. Oracled by replaying BOTH arms in DuckDB off the
    // registered centroid literals and computing the same overlap.
    "q_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 16)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfTopK(qs, emb, k = 10, nlist = 16, nprobe = 4,
          precomputedCentroids = Some(ivfCentroids(s, d)))
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("__hit"), lit(0))).as("hits"))
        .withColumn("recall", col("hits") / lit(10.0))
    }),

    // embedding clustering: every vector labeled with its nearest k-means
    // cell (the corpus-partitioning step of an embedding pipeline, and
    // exactly the assignment the IVF paths persist), plus the cell size.
    // Oracled via the same centroid-literal replay as q_ann_ivf. The raw
    // cosine stays out of the driver output: DuckDB's list_inner_product
    // rounds differently (FMA/SIMD) when one side is a constant vector, so
    // a table×literal cosine is not hash-replayable — the ASSIGNMENT is
    // (ulp noise can only flip an argmax between centroids tied within
    // ~1e-16, which well-separated k-means cells never are).
    "q_embed_cluster" -> ((s, d) => {
      val assigned = Similarity.clusterAssign(Tables.embeddings(s, d), nlist = 16,
        precomputedCentroids = Some(ivfCentroids(s, d)))
      // cell sizes via aggregate + broadcast join-back, NOT count-over-window:
      // a window partitioned by `cell` would shuffle the whole corpus into
      // nlist partitions (max parallelism 16 at any scale); the aggregate is
      // map-side partial over the scan-local assignment and the join-back
      // broadcasts nlist rows
      val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_size"))
      assigned.join(broadcast(sizes), "cell").select("vec_id", "cell", "cell_size")
    }),

    // SemDeDup-style semantic dedup pair mining: k-means cluster blocking
    // (the published embedding-dedup scale recipe — within-cell pairs only,
    // cell assignment scan-local over literal centroids). Oracled by the
    // same centroid-literal replay: DuckDB reassigns cells and mines the
    // same within-cell pairs; the pair COSINES are table×table
    // list_inner_product — bit-exact, as q_dedup_embedding proved.
    "q_semantic_dedup" -> ((s, d) =>
      Similarity.semanticNearDupPairs(Tables.embeddings(s, d), threshold = 0.4,
        nlist = 16, precomputedCentroids = Some(ivfCentroids(s, d)))),

    "q_dedup_embedding" -> ((s, d) =>
      // exact all-pairs (planes=0): this embedding table has no true near-
      // dups (max cosine ~0.5-0.6 by scale), so the demo threshold is low and
      // blocking would be pure recall loss; the LSH-blocked path is exercised
      // in SimilaritySpec with planted duplicates
      Similarity.embeddingNearDupPairs(Tables.embeddings(s, d), threshold = 0.4, planes = 0)),

    // --- versioned IVF index: build once (cell-partitioned versioned table),
    // query via partition-pruned cell reads. Fully oracled via the centroid-
    // literal replay (the persisted index stores the same assignment the
    // oracle recomputes); version semantics pinned in VectorIndexSpec. ---
    "q_ann_ivf_index" -> ((s, d) => {
      val (engine, table) = ivfFixture(s, d)
      ivfCentroids(s, d) // register for the oracle dump (cached, no recompute)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 16)
      graft.operators.VectorIndex.queryIvf(engine, table, queries, k = 10, nprobe = 4)
    }),

    // --- incremental IVF maintenance: base build over 4/5 of the corpus,
    // the last fifth arrives via addBatch against the PINNED centroids —
    // O(batch) written, existing cell partitions untouched. The oracle is
    // the SAME full-corpus centroid replay as q_ann_ivf_index, because
    // append ≡ rebuild with the same centroids (law in VectorIndexSpec). ---
    "q_ann_ivf_append" -> ((s, d) => {
      val (engine, table) = ivfAppendFixture(s, d)
      ivfCentroids(s, d) // register for the oracle dump (cached, no recompute)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 16)
      graft.operators.VectorIndex.queryIvf(engine, table, queries, k = 10, nprobe = 4)
    }),

    // --- composed curation pipeline (capstone): quality filter -> language
    // agreement -> exact dedup under vocab normalization -> per-doc stats ---
    "q_curation_pipeline" -> ((s, d) => {
      val t = col("text")
      // one projection computes every text-derived feature (incl. the vocab
      // hash), then a checkpoint barrier: otherwise Catalyst pushes the
      // quality/lang filter below the projection and the interpreted text
      // expressions run twice per row (once for the predicate, once for the
      // surviving projection) — and `text` itself never leaves this stage
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("source"),
        textStats(t).as("st"), // ONE fused pass replaces tokenCount+langId+quality
        vocabHash.as("vocab_hash"))
        .localCheckpoint()
        .select(col("doc_id"), col("lang"), col("source"),
          col("st").getField("n_tokens").as("n_tokens"),
          langIdFromStats(col("st")).as("lang_pred"),
          qualityScoreFromStats(col("st")).as("quality"),
          col("vocab_hash"))
      val filtered = scored
        .filter(col("quality") >= 0.5 && col("n_tokens") >= 10 && col("lang_pred") === col("lang"))
      Dedup.exactDedup(filtered, idCol = "doc_id", textCol = "vocab_hash")
        .select("doc_id", "lang", "source", "n_tokens", "quality")
    }),

    // --- multimodal ---
    "q_multimodal_features" -> ((s, d) => {
      val media = Multimodal.fromDocuments(s, Tables.documents(s, d))
      Multimodal.extractFeatures(media).toDF()
    }),

    "q_multimodal_frames" -> ((s, d) => {
      val media = Multimodal.fromDocuments(s, Tables.documents(s, d))
      Multimodal.sampleFrames(media, everyNth = 10)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
    }),

    // perceptual image hashing over REAL decoded bitmaps: synthetic linear-
    // gradient BMPs (gray = ax*x + by*y + c, no wrap) are decoded by
    // ImageIO and aHashed with exact integer arithmetic, so the oracle
    // computes every 8x8 cell sum in CLOSED FORM and rebuilds the identical
    // 16-hex-char hash — a real codec round-trip checked value-exactly by
    // an engine that never sees a pixel
    "q_image_ahash" -> ((s, d) => {
      import s.implicits._
      val images = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .filter(_ % 3 == 0)
        .map(id => graft.operators.MediaRecord(
          id, "image", Multimodal.syntheticGradientBmp(id), "synthetic"))
      Multimodal.imageAHashes(images).select(
        col("media_id"),
        lower(lpad(hex(col("ahash")), 16, "0")).as("ahash_hex"),
        bit_count(col("ahash")).cast("int").as("n_bits"))
    }),

    // content-based video near-dup over REALLY decoded frames: textured
    // pattern GIFs plant a shared (one-bit-perturbed) frame in every
    // consecutive video-id pair; the engine must recover exactly that
    // structure through encode → ImageIO decode → per-frame aHash →
    // chunk-blocked Hamming join → video-level rollup
    "q_video_near_dup" -> ((s, d) => {
      import s.implicits._
      val videos = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .filter(_ % 3 == 2)
        .map(id => graft.operators.MediaRecord(
          id, "video", Multimodal.syntheticPatternGif(id), "synthetic"))
      Multimodal.videoNearDupPairs(videos, maxHamming = 3, everyNth = 1)
    }),

    // the audio sibling: loudness-envelope signatures over REALLY decoded
    // modulated WAVs — window amplitudes are analytic, so the oracle
    // rebuilds the 64-bit signature without hearing a sample
    "q_audio_signature" -> ((s, d) => {
      import s.implicits._
      val tracks = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .filter(_ % 3 == 1)
        .map(id => graft.operators.MediaRecord(
          id, "audio", Multimodal.syntheticModulatedWav(id), "synthetic"))
      Multimodal.audioSignatures(tracks).select(
        col("media_id"),
        lower(lpad(hex(col("asig")), 16, "0")).as("asig_hex"),
        bit_count(col("asig")).cast("int").as("n_bits"))
    })
  )

  // ---- shared DuckDB SQL builders (single source of truth for every oracle
  // that mirrors TextFunctions semantics) ----

  private val duckTokens = "string_split_regex(trim(lower(text)), '\\s+')"
  private def duckSw(words: Seq[String]) =
    s"len(list_filter($duckTokens, x -> list_contains([${words.map(w => s"'$w'").mkString(",")}], x)))"

  private val swEn = duckSw(StopwordsEn)
  private val swEs = duckSw(StopwordsEs)
  private val swDe = duckSw(StopwordsDe)
  private val swFr = duckSw(StopwordsFr)
  private val nTokSql = s"len($duckTokens)"
  private val mwlSql = s"(length(regexp_replace(trim(text), '\\s+', '', 'g')) / $nTokSql)"
  private val punctSql = "length(regexp_replace(text, '[^.!?,;:]', '', 'g'))"

  /** Mirrors [[graft.functions.TextFunctions.qualityScore]]. */
  private val qualitySql = {
    val swRatio = s"($swEn / $nTokSql)"
    val punctRatio = s"($punctSql / length(text))"
    s"""((CASE WHEN $swRatio > 0.4 THEN 1.0 ELSE $swRatio / 0.4 END
       |  + CASE WHEN $mwlSql >= 3 AND $mwlSql <= 10 THEN 1.0 ELSE 0.5 END
       |  + CASE WHEN $punctRatio > 0.2 THEN 0.0 ELSE 1.0 - $punctRatio / 0.2 END) / 3)""".stripMargin
  }

  /** Mirrors [[graft.functions.TextFunctions.langId]]. */
  private val langPredSql =
    s"""CASE WHEN $swEn + $swEs + $swDe + $swFr = 0 THEN 'und'
       |  WHEN $swEn >= $swEs AND $swEn >= $swDe AND $swEn >= $swFr THEN 'en'
       |  WHEN $swEs >= $swDe AND $swEs >= $swFr THEN 'es'
       |  WHEN $swDe >= $swFr THEN 'de'
       |  ELSE 'fr' END""".stripMargin

  /** Mirrors the vocab-normalized content hash used by the dedup queries. */
  private val vocabHashSql =
    s"md5(array_to_string(list_sort(list_distinct($duckTokens)), ' '))"

  /** 3-gram string-shingle near-dup pairs at Jaccard >= 0.8: the exact ground
    * truth the MinHash-LSH path verifies against. String vs 64-bit-hashed
    * shingles agree up to negligible collision odds (same argument as the
    * q_contamination oracle); docs under 3 words fall back to whole-text-as-
    * one-shingle, mirroring WordShingleHashes. Jaccard VALUES are integer
    * ratios — bit-identical across engines. The size prune in the join is
    * lossless: jaccard >= t forbids |A|/|B| ratios below t. */
  private val shinglePairsCte =
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
       |        generate_series(1, len(w) - 2),
       |        i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
       |      ELSE [array_to_string(w, ' ')] END AS s
       |  FROM (SELECT doc_id, $duckTokens AS w FROM documents)),
       |sized AS (SELECT doc_id AS id, s, len(s) AS n FROM sh),
       |lshpairs AS (
       |  SELECT a.id AS id1, b.id AS id2,
       |    len(list_intersect(a.s, b.s)) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS jaccard
       |  FROM sized a JOIN sized b
       |    ON a.id < b.id AND a.n >= b.n * 0.8 AND b.n >= a.n * 0.8
       |  WHERE len(list_intersect(a.s, b.s)) / (a.n + b.n - len(list_intersect(a.s, b.s))) >= 0.8)""".stripMargin

  /** Replay of dedupAgainstCorpus (and its index twin): cross-reject
    * against the corpus side, then the connected-components closure WITHIN
    * the surviving new docs. Shared by q_dedup_against and
    * q_dedup_against_index — one oracle, two plans (recompute-the-corpus
    * vs read-the-versioned-index). */
  private lazy val dedupAgainstSql =
    s"""WITH RECURSIVE $shinglePairsCte,
       |novel AS (
       |  SELECT doc_id FROM documents WHERE doc_id >= 250
       |  AND doc_id NOT IN (SELECT id2 FROM lshpairs WHERE id2 >= 250 AND id1 < 250)),
       |inbatch AS (
       |  SELECT id1, id2 FROM lshpairs
       |  WHERE id1 IN (SELECT doc_id FROM novel) AND id2 IN (SELECT doc_id FROM novel)),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM inbatch
       |  UNION
       |  SELECT id2 AS src, id1 AS dst FROM inbatch),
       |reach(a, b) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |losers AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) <> a)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id IN (SELECT doc_id FROM novel)
       |  AND doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin

  /** Replay the full IVF path in DuckDB with the learned centroids embedded
    * as literals: same cell argmin (cosine desc, cell-id tiebreak), same
    * nprobe probing, same exact in-cell cosine ranking. Float centroids are
    * rendered via their exact double values, and FloatVectorDot widens to
    * double before multiplying, so every score is bit-identical. One SQL
    * serves q_ann_ivf AND q_ann_ivf_index: the persisted index stores the
    * identical assignment (same learnCentroids, same assignCells). */
  /** The WITH-prefix every IVF-replaying oracle shares: centroid literals
    * (`cents`), normalized vectors (`v`), the corpus cell assignment
    * (`cand`, rn = 1) and the query probe cells (`qp`, rn <= nprobe).
    * ONE definition so q_ann_ivf and q_ann_recall can never drift on the
    * tie-break or normalization they both claim to replay. */
  private def ivfCtePrefix(centroids: Array[Array[Float]], nprobe: Int): String = {
    val values = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n      ")
    s"""cents AS (
       |  SELECT cell, cv, SQRT(list_inner_product(cv, cv)) AS cn
       |  FROM (VALUES
       |      $values) AS t(cell, cv)),
       |v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
       |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                            CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |cand AS (
       |  SELECT vec_id, dv, nrm, cell FROM (
       |    SELECT v.vec_id, v.dv, v.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c)
       |  WHERE rn = 1),
       |qp AS (
       |  SELECT vec_id AS query_id, dv AS qv, nrm AS qn, cell FROM (
       |    SELECT v.vec_id, v.dv, v.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c WHERE v.vec_id < 16)
       |  WHERE rn <= $nprobe)""".stripMargin
  }

  private def ivfOracleSql(centroids: Array[Array[Float]], k: Int, nprobe: Int): String =
    s"""WITH ${ivfCtePrefix(centroids, nprobe)},
       |scored AS (
       |  SELECT qp.query_id, cand.vec_id AS neighbor_id,
       |    list_inner_product(qp.qv, cand.dv) / (qp.qn * cand.nrm) AS cosine
       |  FROM qp JOIN cand USING (cell) WHERE qp.query_id <> cand.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
       |  FROM scored)
       |SELECT query_id, neighbor_id, cosine, "rank" FROM ranked
       |WHERE "rank" <= $k""".stripMargin

  /** The q_ann_recall oracle: both arms replayed — [[ivfOracleSql]]'s
    * probe-cell candidate walk and the exact all-pairs baseline — then the
    * per-query (query, neighbor) overlap. Membership, not rank, is
    * compared, and both engines break cosine ties identically, so the
    * overlap is hash-exact. */
  private def recallOracleSql(centroids: Array[Array[Float]], k: Int, nprobe: Int): String =
    s"""WITH ${ivfCtePrefix(centroids, nprobe)},
       |ivf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qp.query_id, cand.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY qp.query_id
       |        ORDER BY list_inner_product(qp.qv, cand.dv) / (qp.qn * cand.nrm) DESC,
       |                 cand.vec_id) AS rnk
       |    FROM qp JOIN cand USING (cell) WHERE qp.query_id <> cand.vec_id)
       |  WHERE rnk <= $k),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY qq.vec_id
       |        ORDER BY list_inner_product(qq.dv, c.dv) / (qq.nrm * c.nrm) DESC,
       |                 c.vec_id) AS rnk
       |    FROM v qq JOIN v c ON qq.vec_id < 16 AND qq.vec_id <> c.vec_id)
       |  WHERE rnk <= $k)
       |SELECT e.query_id,
       |  CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) / 10.0
       |    AS recall
       |FROM exact e LEFT JOIN ivf i
       |  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** The q_embed_cluster oracle: the assignment CTE of [[ivfOracleSql]] plus
    * per-cell counts. Cosines are used only for the argmax (robust to the
    * table×constant FMA rounding DuckDB's list_inner_product applies — a
    * flip needs two centroids tied within ulps); the OUTPUT is integral. */
  private def clusterOracleSql(centroids: Array[Array[Float]]): String = {
    val values = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n      ")
    s"""WITH cents AS (
       |  SELECT cell, cv, SQRT(list_inner_product(cv, cv)) AS cn
       |  FROM (VALUES
       |      $values) AS t(cell, cv)),
       |v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
       |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                            CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c)
       |  WHERE rn = 1)
       |SELECT vec_id, cell, COUNT(*) OVER (PARTITION BY cell) AS cell_size
       |FROM assigned""".stripMargin
  }

  /** The q_semantic_dedup oracle: same assignment CTE, then the within-cell
    * pair mining. Pair cosines are table×table list_inner_product over the
    * stored vectors — the bit-exact case (q_dedup_embedding's proof); only
    * the cell BLOCKING rests on the ulp-robust argmax. */
  private def semanticDedupOracleSql(centroids: Array[Array[Float]], threshold: Double): String = {
    val values = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n      ")
    s"""WITH cents AS (
       |  SELECT cell, cv, SQRT(list_inner_product(cv, cv)) AS cn
       |  FROM (VALUES
       |      $values) AS t(cell, cv)),
       |v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
       |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                            CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, dv, nrm, cell FROM (
       |    SELECT v.vec_id, v.dv, v.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c)
       |  WHERE rn = 1)
       |SELECT a.vec_id AS id1, b.vec_id AS id2, a.cell,
       |  list_inner_product(a.dv, b.dv) / (a.nrm * b.nrm) AS cosine
       |FROM assigned a JOIN assigned b
       |  ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE list_inner_product(a.dv, b.dv) / (a.nrm * b.nrm) >= $threshold""".stripMargin
  }

  /** Replay SimHash in DuckDB with the corpus token-hash dictionary embedded
    * as literals: per-OCCURRENCE ±1 votes on each of 64 bits (bit set iff
    * votes > 0 — the pinned kernel rule), then the full quadratic Hamming
    * pairing (the 4×16-bit-chunk blocking in Spark is recall-complete to
    * Hamming 3 by pigeonhole, so its pair set IS the all-pairs set). Bit 63
    * contributes Long.MinValue — the partial sums never overflow because
    * bits 0..62 total at most 2^63-1 and the sign bit is added last. */
  private def simhashOracleSql(dict: Array[(String, Long)], maxHamming: Int): String = {
    val values = dict.sortBy(_._1).map { case (t, h) =>
      s"('${t.replace("'", "''")}', CAST($h AS BIGINT))"
    }.mkString(",\n      ")
    val sums = (0 until 64).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n    ")
    val bits = (0 until 64).map(b =>
      s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)").mkString("\n    + ")
    s"""WITH dict(tok, h) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |votes AS (
       |  SELECT t.doc_id,
       |    $sums
       |  FROM toks t JOIN dict ON dict.tok = t.tok
       |  GROUP BY t.doc_id),
       |sh AS (
       |  SELECT doc_id,
       |    $bits AS sh
       |  FROM votes)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  bit_count(xor(a.sh, b.sh)) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming""".stripMargin
  }

  /** The IVF, SimHash, and DSIR oracles exist only once their queries have
    * run in this JVM (all embed data-derived literals); Verify dumps
    * oracle_sql.json after running every query, so the driver always sees
    * them. The SimHash oracle is omitted for corpora whose vocabulary would
    * not fit a SQL literal table (falls back to the rows-only check). */
  def oracles: Map[String, String] = {
    val ivf = soleRegistered(ivfCentroidCache) match {
      case Some(cents) =>
        val sql = ivfOracleSql(cents, k = 10, nprobe = 4)
        // q_ann_ivf_append shares the full-corpus replay: append ≡ rebuild
        // with the same centroids is the operator's law, so the appended
        // index answers the identical oracle
        Map("q_ann_ivf" -> sql, "q_ann_ivf_index" -> sql, "q_ann_ivf_append" -> sql,
          "q_ann_recall" -> recallOracleSql(cents, k = 10, nprobe = 4),
          "q_embed_cluster" -> clusterOracleSql(cents),
          "q_semantic_dedup" -> semanticDedupOracleSql(cents, threshold = 0.4))
      case None => Map.empty[String, String]
    }
    val simhash = soleRegistered(simhashDictCache) match {
      case Some(dict) if dict.length <= 10000 =>
        Map("q_dedup_simhash" -> simhashOracleSql(dict, maxHamming = 3),
          "q_text_knn" -> textKnnOracleSql(dict, dim = 64, k = 10))
      case _ => Map.empty[String, String]
    }
    val dsir = soleRegistered(dsirWeightCache) match {
      case Some(w) if w.nonEmpty && w.size <= 10000 =>
        Map("q_dsir_weight" -> dsirOracleSql(w),
          "q_dsir_sample" -> dsirSampleOracleSql(w, n = 100, seed = 42))
      case _ => Map.empty[String, String]
    }
    val bm25 = soleRegistered(bm25StatsCache) match {
      case Some(st) =>
        // the hybrid oracle needs BOTH registries: bm25 stats for the lexical
        // arm and IVF centroids for the vector arm (q_hybrid_search itself
        // registers both when it runs)
        val hybrid = soleRegistered(ivfCentroidCache) match {
          case Some(cents) => Map("q_hybrid_search" ->
            hybridOracleSql(st, cents, kList = Bm25K, kFuse = 20, rrfK = 60, nprobe = 4))
          case None => Map.empty[String, String]
        }
        Map("q_bm25_search" -> bm25OracleSql(st, Bm25K),
          "q_bm25_index" -> bm25OracleSql(st, Bm25K)) ++ hybrid
      case None => Map.empty[String, String]
    }
    val lm = soleRegistered(lmCache) match {
      case Some((m, t1, t2)) if m.costs.size <= 10000 =>
        Map("q_lm_perplexity" -> lmOracleSql(m, t1, t2))
      case _ => Map.empty[String, String]
    }
    val lm2 = soleRegistered(lm2Cache) match {
      case Some(m) if m.costs.size <= 10000 =>
        Map("q_lm_bigram" -> lm2OracleSql(m))
      case _ => Map.empty[String, String]
    }
    val nb = soleRegistered(nbCache) match {
      case Some(m) if m.loglik.size <= 10000 =>
        Map("q_nb_classify" -> nbOracleSql(m))
      case _ => Map.empty[String, String]
    }
    staticOracles ++ ivf ++ simhash ++ dsir ++ bm25 ++ lm ++ lm2 ++ nb
  }

  /** Replay of q_lm_perplexity: the registered integer cost table as a
    * VALUES literal, OOV coalesce, integer-division mean, threshold CASE —
    * pure integer arithmetic throughout. */
  private def lmOracleSql(m: graft.operators.QualityModels.LmModel, t1: Long, t2: Long): String = {
    val values = m.costs.toList.sortBy(_._1).map { case (t, w) =>
      s"('${t.replace("'", "''")}', CAST($w AS BIGINT))"
    }.mkString(",\n      ")
    s"""WITH w(tok, wt) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |scored AS (
       |  SELECT t.doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(COALESCE(w.wt, ${m.oovCost})) AS BIGINT) AS lm_cost
       |  FROM toks t LEFT JOIN w ON w.tok = t.tok
       |  GROUP BY t.doc_id)
       |SELECT doc_id, n_tokens, lm_cost, lm_cost // n_tokens AS avg_millinats,
       |  CASE WHEN lm_cost // n_tokens <= $t1 THEN 'head'
       |       WHEN lm_cost // n_tokens <= $t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored""".stripMargin
  }

  /** Replay of q_text_knn: hashed-TF bucket counts from the registered
    * token-hash dictionary (the SimHash trick), then the cosine chain over
    * SPARSE counts — buckets absent from a doc contribute exactly 0 to the
    * dense dot product, and every count is an exact small integer in both
    * engines, so the doubles agree bit-for-bit. */
  private def textKnnOracleSql(dict: Array[(String, Long)], dim: Int, k: Int): String = {
    val values = dict.sortBy(_._1).map { case (t, h) =>
      s"('${t.replace("'", "''")}', CAST($h AS BIGINT))"
    }.mkString(",\n      ")
    s"""WITH dict(tok, h) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |bk AS (
       |  SELECT t.doc_id, ((d.h % $dim) + $dim) % $dim AS b
       |  FROM toks t JOIN dict d USING (tok)),
       |cnt AS (SELECT doc_id, b, CAST(COUNT(*) AS DOUBLE) AS c FROM bk GROUP BY 1, 2),
       |nrm AS (SELECT doc_id, SQRT(SUM(c * c)) AS n FROM cnt GROUP BY doc_id),
       |dots AS (
       |  SELECT a.doc_id AS neighbor_id, SUM(q.c * a.c) AS dot
       |  FROM cnt a JOIN cnt q ON q.doc_id = 0 AND q.b = a.b AND a.doc_id <> 0
       |  GROUP BY a.doc_id),
       |scored AS (
       |  SELECT CAST(0 AS BIGINT) AS query_id, d.neighbor_id,
       |    d.dot / (nq.n * na.n) AS cosine
       |  FROM dots d
       |  JOIN nrm na ON na.doc_id = d.neighbor_id
       |  JOIN nrm nq ON nq.doc_id = 0),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, neighbor_id) AS "rank"
       |  FROM scored)
       |SELECT query_id, neighbor_id, cosine, "rank" FROM ranked
       |WHERE "rank" <= $k""".stripMargin
  }

  /** Replay of q_lm_bigram: bigram units (space-joined adjacent token
    * pairs, whole-text fallback under 2 tokens — the shingles convention),
    * same integer table join and integer-division mean as the unigram
    * oracle. */
  private def lm2OracleSql(m: graft.operators.QualityModels.LmModel): String = {
    val values = m.costs.toList.sortBy(_._1).map { case (t, w) =>
      s"('${t.replace("'", "''")}', CAST($w AS BIGINT))"
    }.mkString(",\n      ")
    s"""WITH w2(tok, wt) AS (VALUES
       |      $values),
       |units AS (
       |  SELECT doc_id,
       |    unnest(CASE WHEN len(w) >= 2 THEN list_transform(
       |        generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
       |      ELSE [array_to_string(w, ' ')] END) AS tok
       |  FROM (SELECT doc_id, $duckTokens AS w FROM documents))
       |SELECT u.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(COALESCE(t.wt, ${m.oovCost})) AS BIGINT) AS lm_cost,
       |  CAST(SUM(COALESCE(t.wt, ${m.oovCost})) AS BIGINT) // COUNT(*) AS avg_millinats
       |FROM units u LEFT JOIN w2 t ON t.tok = u.tok
       |GROUP BY u.doc_id""".stripMargin
  }

  /** Replay of q_nb_classify: likelihood and prior tables as VALUES
    * literals, per-(doc, label) integer sums, argmax by ROW_NUMBER with the
    * same (score DESC, label) tiebreak. */
  private def nbOracleSql(m: graft.operators.QualityModels.NbModel): String = {
    // labels are data-derived like tokens — escape quotes in BOTH (a label
    // value containing ' would otherwise generate invalid/injected oracle SQL)
    val likValues = m.loglik.toList.sortBy { case ((t, l), _) => (t, l) }
      .map { case ((t, l), w) =>
        s"('${t.replace("'", "''")}', '${l.replace("'", "''")}', CAST($w AS BIGINT))" }
      .mkString(",\n      ")
    val priValues = m.priors.toList.sortBy(_._1)
      .map { case (l, p) => s"('${l.replace("'", "''")}', CAST($p AS BIGINT))" }
      .mkString(",\n      ")
    s"""WITH lik(tok, l, w) AS (VALUES
       |      $likValues),
       |pri(l, p) AS (VALUES
       |      $priValues),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |ts AS (
       |  SELECT t.doc_id, lik.l, CAST(SUM(lik.w) AS BIGINT) AS s
       |  FROM toks t JOIN lik ON lik.tok = t.tok
       |  GROUP BY t.doc_id, lik.l),
       |allscores AS (
       |  SELECT d.doc_id, d.lang, pri.l, pri.p + COALESCE(ts.s, 0) AS total
       |  FROM documents d CROSS JOIN pri
       |  LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.l = pri.l),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY total DESC, l) AS rn
       |  FROM allscores)
       |SELECT doc_id, lang, l AS predicted, total AS score_millinats,
       |  (l = lang) AS correct
       |FROM ranked WHERE rn = 1""".stripMargin
  }

  /** Replay of [[graft.operators.TextSearch.bm25TopK]] with the registered
    * integer idf table as a VALUES literal and every shared double constant
    * embedded as its shortest round-trip decimal (both engines parse it back
    * to the identical IEEE double, so the per-(doc, term) contribution chain
    * — mult, div, floor — is bit-identical and the summed score is a pure
    * integer). Shape-identical to TextSearch.contribution. */
  private def bm25OracleSql(st: graft.operators.TextSearch.Bm25Stats, k: Int): String = {
    val c = graft.operators.TextSearch.consts(st)
    val idf = graft.operators.TextSearch.idfMicro(st)
    val values = idf.toList.sortBy(_._1).map { case (t, w) =>
      s"('${t.replace("'", "''")}', CAST($w AS BIGINT))"
    }.mkString(",\n      ")
    val termList = idf.keys.toList.sorted.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH idf(tok, wt) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |dl AS (
       |  SELECT doc_id, len($duckTokens) AS dl FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN ($termList) GROUP BY doc_id, tok),
       |scored AS (
       |  SELECT t.doc_id,
       |    CAST(SUM(CAST(FLOOR(CAST(i.wt AS DOUBLE) *
       |      ((CAST(t.tf AS DOUBLE) * ${c.kk}) /
       |       (CAST(t.tf AS DOUBLE) + ${c.k1} * (${c.c1} + ${c.b} *
       |        (CAST(d.dl AS DOUBLE) / ${c.avgdl}))))) AS BIGINT)) AS BIGINT) AS score_micro,
       |    COUNT(*) AS n_terms
       |  FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id)
       |  GROUP BY t.doc_id)
       |SELECT doc_id, score_micro, n_terms FROM scored
       |ORDER BY score_micro DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Replay of q_hybrid_search: the BM25 scored CTE (same literals as
    * [[bm25OracleSql]]) ranked top-`kList`, the exact-cosine ranking around
    * query vector 0 (bit-exact doubles — q_ann_cosine's proof), then the
    * all-integer reciprocal-rank fusion (`1000000 // (rrfK + rank)`). */
  private def hybridOracleSql(
      st: graft.operators.TextSearch.Bm25Stats, centroids: Array[Array[Float]],
      kList: Int, kFuse: Int, rrfK: Int, nprobe: Int): String = {
    val c = graft.operators.TextSearch.consts(st)
    val idf = graft.operators.TextSearch.idfMicro(st)
    val values = idf.toList.sortBy(_._1).map { case (t, w) =>
      s"('${t.replace("'", "''")}', CAST($w AS BIGINT))"
    }.mkString(",\n      ")
    val termList = idf.keys.toList.sorted.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val centValues = centroids.zipWithIndex.map { case (cv, i) =>
      s"($i, [${cv.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n      ")
    s"""WITH idf(tok, wt) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |dl AS (
       |  SELECT doc_id, len($duckTokens) AS dl FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN ($termList) GROUP BY doc_id, tok),
       |scored AS (
       |  SELECT t.doc_id,
       |    CAST(SUM(CAST(FLOOR(CAST(i.wt AS DOUBLE) *
       |      ((CAST(t.tf AS DOUBLE) * ${c.kk}) /
       |       (CAST(t.tf AS DOUBLE) + ${c.k1} * (${c.c1} + ${c.b} *
       |        (CAST(d.dl AS DOUBLE) / ${c.avgdl}))))) AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id)
       |  GROUP BY t.doc_id),
       |lex AS (
       |  SELECT doc_id, r FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS r
       |    FROM scored)
       |  WHERE r <= $kList),
       |v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
       |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                            CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT cell, cv, SQRT(list_inner_product(cv, cv)) AS cn
       |  FROM (VALUES
       |      $centValues) AS t(cell, cv)),
       |cand AS (
       |  SELECT vec_id, dv, nrm, cell FROM (
       |    SELECT v.vec_id, v.dv, v.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c)
       |  WHERE rn = 1),
       |qcells AS (
       |  SELECT cell FROM (
       |    SELECT c.cell,
       |      ROW_NUMBER() OVER (
       |        ORDER BY list_inner_product(v.dv, c.cv) / (v.nrm * c.cn) DESC, c.cell) AS rn
       |    FROM v CROSS JOIN cents c WHERE v.vec_id = 0)
       |  WHERE rn <= $nprobe),
       |cos AS (
       |  SELECT cand.vec_id AS doc_id,
       |    list_inner_product(q.dv, cand.dv) / (q.nrm * cand.nrm) AS cosine
       |  FROM cand JOIN qcells USING (cell) CROSS JOIN v q
       |  WHERE q.vec_id = 0 AND cand.vec_id <> 0),
       |vec AS (
       |  SELECT doc_id, r FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r
       |    FROM cos)
       |  WHERE r <= $kList),
       |fused AS (
       |  SELECT doc_id, l.r AS lex_rank, ve.r AS vec_rank,
       |    COALESCE(1000000 // ($rrfK + l.r), 0)
       |      + COALESCE(1000000 // ($rrfK + ve.r), 0) AS rrf_micro
       |  FROM lex l FULL OUTER JOIN vec ve USING (doc_id))
       |SELECT doc_id, lex_rank, vec_rank, rrf_micro FROM fused
       |ORDER BY rrf_micro DESC, doc_id LIMIT $kFuse""".stripMargin
  }

  /** Replay of [[graft.operators.CorpusTools.importanceWeights]] with the
    * registered integer weight table as a VALUES literal: explode tokens,
    * left-join weights, integer sum per doc — hash-exact by construction
    * (SUMs cast to BIGINT: DuckDB's SUM(BIGINT) is HUGEINT). */
  private def dsirOracleSql(w: Map[String, Long]): String = {
    val values = w.toList.sortBy(_._1).map { case (t, wt) =>
      s"('${t.replace("'", "''")}', CAST($wt AS BIGINT))"
    }.mkString(",\n      ")
    s"""WITH w(tok, wt) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |scored AS (
       |  SELECT t.doc_id,
       |    CAST(COALESCE(SUM(w.wt), 0) AS BIGINT) AS dsir_score
       |  FROM toks t LEFT JOIN w ON w.tok = t.tok
       |  GROUP BY t.doc_id)
       |SELECT doc_id, dsir_score, dsir_score >= 0 AS kept FROM scored""".stripMargin
  }

  /** Replay of [[graft.operators.CorpusTools.dsirSample]]: the same scored
    * CTE, then the identical md5-derived integer Gumbel key (instr-based hex
    * decode — both engines agree digit by digit) and top-n. Hash-exact: the
    * key is an integer, ties break on doc_id. */
  private def dsirSampleOracleSql(w: Map[String, Long], n: Int, seed: Int): String = {
    val values = w.toList.sortBy(_._1).map { case (t, wt) =>
      s"('${t.replace("'", "''")}', CAST($wt AS BIGINT))"
    }.mkString(",\n      ")
    val h = s"md5(concat_ws('|', '$seed', CAST(doc_id AS VARCHAR)))"
    val hv = (0 until 4)
      .map(i => s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
      .mkString("(", " + ", ")")
    val u = s"($hv + 0.5) / 65536.0"
    s"""WITH w(tok, wt) AS (VALUES
       |      $values),
       |toks AS (
       |  SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |scored AS (
       |  SELECT t.doc_id,
       |    CAST(COALESCE(SUM(w.wt), 0) AS BIGINT) AS dsir_score
       |  FROM toks t LEFT JOIN w ON w.tok = t.tok
       |  GROUP BY t.doc_id),
       |keyed AS (
       |  SELECT doc_id, dsir_score,
       |    dsir_score + CAST(ROUND(-1000.0 * LN(-LN($u))) AS BIGINT) AS gumbel_key
       |  FROM scored)
       |SELECT doc_id, dsir_score, gumbel_key FROM keyed
       |ORDER BY gumbel_key DESC, doc_id LIMIT $n""".stripMargin
  }

  private val staticOracles: Map[String, String] = Map(
    "q_corpus_report" ->
      s"""WITH per_doc AS (
         |  SELECT source, lang, $nTokSql AS n_tokens, $punctSql AS n_punct
         |  FROM documents)
         |SELECT source,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_punct) AS BIGINT) AS total_punct,
         |  COUNT(DISTINCT lang) AS n_langs,
         |  MIN(n_tokens) AS min_tokens,
         |  MAX(n_tokens) AS max_tokens
         |FROM per_doc GROUP BY source""".stripMargin,

    "q_text_stats" ->
      s"""SELECT doc_id, lang,
         |  $nTokSql AS n_tokens,
         |  $punctSql AS n_punct,
         |  $swEn AS sw_en, $swEs AS sw_es, $swDe AS sw_de, $swFr AS sw_fr,
         |  $langPredSql AS lang_pred,
         |  $mwlSql AS mean_word_len,
         |  $qualitySql AS quality
         |FROM documents""".stripMargin,

    "q_token_count" ->
      s"""SELECT doc_id,
         |  len($duckTokens) AS ws_tokens,
         |  len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]+|[^a-zA-Z0-9\\s]', 0)) AS bpeish_tokens
         |FROM documents""".stripMargin,

    "q_doc_fingerprint" ->
      s"""SELECT doc_id, md5(trim(text)) AS content_md5,
         |  CASE WHEN len(w) >= 3 THEN
         |    list_aggregate(list_transform(
         |      list_transform(generate_series(1, len(w)-2), i -> concat_ws(' ', w[i], w[i+1], w[i+2])),
         |      s -> md5(s)), 'min')
         |  ELSE md5(array_to_string(w, ' ')) END AS min_shingle_md5
         |FROM (SELECT doc_id, $duckTokens AS w, text FROM documents)""".stripMargin,

    "q_dedup_groups" ->
      s"""SELECT md5(trim(vh)) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
         |FROM (SELECT doc_id, $vocabHashSql AS vh FROM documents)
         |GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT doc_id, vocab_hash, lang, source FROM (
         |  SELECT doc_id, lang, source,
         |    $vocabHashSql AS vocab_hash,
         |    ROW_NUMBER() OVER (PARTITION BY $vocabHashSql ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1""".stripMargin,

    // Full LSH oracle: the hyperplane WEIGHTS are deterministic constants, so
    // they can be embedded in the SQL as list literals — DuckDB then computes
    // the same sign buckets (list_inner_product = the same sequential double
    // accumulation as HyperplaneLshBucket), the same multi-probe set, and the
    // same bit-exact cosine ranking. The whole approximate index is replayed
    // exactly by an independent engine.
    "q_ann_lsh" -> {
      val w = graft.functions.HyperplaneLshBucket.weightTable(planes = 8, dims = OracleLshDims)
      def lst(p: Int) = w(p).map(_.toString).mkString("[", ", ", "]")
      val bucketExpr = (0 until 8).map { p =>
        s"(CASE WHEN list_inner_product(dv, ${lst(p)}) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString("\n      + ")
      val probeList = "[bucket" + (0 until 8).map(p => s", xor(bucket, ${1L << p})").mkString + "]"
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
         |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
         |                            CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |b AS (
         |  SELECT vec_id, dv, nrm,
         |    $bucketExpr AS bucket
         |  FROM v),
         |q AS (
         |  SELECT vec_id AS query_id, dv AS qv, nrm AS qn,
         |    UNNEST($probeList) AS probe
         |  FROM b WHERE vec_id < 16),
         |scored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_inner_product(q.qv, c.dv) / (q.qn * c.nrm) AS cosine
         |  FROM q JOIN b c ON c.bucket = q.probe AND q.query_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, "rank" FROM ranked
         |WHERE "rank" <= 10""".stripMargin
    },

    // Bit-exact float parity: DuckDB's list_inner_product over DOUBLE[] is the
    // same sequential double accumulation as our codegen'd FloatVectorDot
    // (verified bit-identical on this data), and sqrt/mul/div are IEEE-defined
    // — so cosine SCORES hash-match, not just ranks.
    "q_ann_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
        |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                            CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_inner_product(q.dv, c.dv) / (q.nrm * c.nrm) AS cosine
        |  FROM v c JOIN v q ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM ranked
        |WHERE "rank" <= 10""".stripMargin,

    "q_dedup_embedding" ->
      """WITH v AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS dv,
        |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                            CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT a.id AS id1, b.id AS id2,
        |  list_inner_product(a.dv, b.dv) / (a.nrm * b.nrm) AS cosine
        |FROM v a JOIN v b ON a.id < b.id
        |WHERE list_inner_product(a.dv, b.dv) / (a.nrm * b.nrm) >= 0.4""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      s"""WITH sets AS (SELECT doc_id AS id, source AS blk, list_distinct($duckTokens) AS w FROM documents)
         |SELECT a.id AS id1, b.id AS id2,
         |  len(list_intersect(a.w, b.w)) / len(list_distinct(list_concat(a.w, b.w))) AS jaccard
         |FROM sets a JOIN sets b ON a.id < b.id AND a.blk = b.blk
         |WHERE len(list_intersect(a.w, b.w)) / len(list_distinct(list_concat(a.w, b.w))) >= 0.8""".stripMargin,

    // Independent replay of connected components: DuckDB computes the SAME
    // near-dup pair set (the q_dedup_ngram_jaccard oracle), then a recursive
    // CTE takes the transitive closure and labels each doc with the minimum
    // reachable id — exactly the fixpoint dupClusters converges to.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE sets AS (
         |  SELECT doc_id AS id, source AS blk, list_distinct($duckTokens) AS w FROM documents),
         |pairs AS (
         |  SELECT a.id AS id1, b.id AS id2
         |  FROM sets a JOIN sets b ON a.id < b.id AND a.blk = b.blk
         |  WHERE len(list_intersect(a.w, b.w)) / len(list_distinct(list_concat(a.w, b.w))) >= 0.8),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION
         |  SELECT id2 AS src, id1 AS dst FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lbl""".stripMargin,

    // MinHash-LSH pairs, fully oracled: on this fixture the LSH pair set
    // equals the exact 3-gram shingle ground truth (verified 0-diff at
    // sf0.001/0.01/0.1 — 100% recall from 8x2 banding, precision 1.0 from
    // the exact-verify stage), so DuckDB mines the same set quadratically
    "q_dedup_minhash" ->
      s"""WITH $shinglePairsCte
         |SELECT id1, id2, jaccard FROM lshpairs""".stripMargin,

    // closure over the LSH pair graph — same recursive-CTE replay as
    // q_dedup_clusters, over the 3-gram shingle pairs
    "q_dedup_clusters_lsh" ->
      s"""WITH RECURSIVE $shinglePairsCte,
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM lshpairs
         |  UNION
         |  SELECT id2 AS src, id1 AS dst FROM lshpairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lbl""".stripMargin,

    // ground-truth cross pairs: id1 < id2 always, so a pair straddling the
    // 250 cutoff has id2 on the new side and id1 on the corpus side
    "q_dedup_cross" ->
      s"""WITH $shinglePairsCte
         |SELECT id2 AS left_id, id1 AS right_id, jaccard FROM lshpairs
         |WHERE id2 >= 250 AND id1 < 250""".stripMargin,

    // replay of dedupAgainstCorpus: cross-reject against the corpus side,
    // then the connected-components closure WITHIN the surviving new docs
    "q_dedup_against" -> dedupAgainstSql,

    // the index path is pinned to the SAME result: one oracle, two plans
    // (recompute-the-corpus vs read-the-versioned-index)
    "q_dedup_against_index" -> dedupAgainstSql,

    "q_dedup_corpus_lsh" ->
      s"""WITH RECURSIVE $shinglePairsCte,
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM lshpairs
         |  UNION
         |  SELECT id2 AS src, id1 AS dst FROM lshpairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |losers AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) <> a)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    // classic Levenshtein is identically defined in both engines and the
    // distances are integers — hash-exact. The oracle's |len diff| <= 1
    // predicate is the same lossless band the Spark side joins on.
    "q_fuzzy_join" ->
      """WITH corrupted AS (
        |  SELECT p_partkey AS c_id,
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
        |      || substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2) AS c_name
        |  FROM part WHERE p_partkey < 1000)
        |SELECT c.c_id, c.c_name, p.p_partkey AS match_id, p.p_name AS match_name,
        |  levenshtein(c.c_name, p.p_name) AS distance
        |FROM corrupted c JOIN part p
        |  ON abs(length(c.c_name) - length(p.p_name)) <= 1
        | AND levenshtein(c.c_name, p.p_name) <= 1""".stripMargin,

    // string shingles here vs 64-bit hashed shingles in Spark: distinct and
    // intersection COUNTS agree up to negligible collision odds, and the
    // <3-word fallback mirrors WordShingleHashes (whole text as one shingle)
    "q_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |        generate_series(1, len(w) - 2),
         |        i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
         |      ELSE [array_to_string(w, ' ')] END AS s
         |  FROM (SELECT doc_id, $duckTokens AS w FROM documents)),
         |b AS (SELECT doc_id AS bench_id, s AS bs FROM sh WHERE doc_id < 16),
         |c AS (SELECT doc_id AS corpus_id, s AS cs FROM sh)
         |SELECT corpus_id, bench_id,
         |  len(list_intersect(cs, bs)) / len(bs) AS containment
         |FROM c JOIN b ON len(list_intersect(cs, bs)) / len(bs) >= 0.5""".stripMargin,

    // cut arm: the same flagged-id set applied as NOT IN
    "q_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
         |        generate_series(1, len(w) - 2),
         |        i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
         |      ELSE [array_to_string(w, ' ')] END AS s
         |  FROM (SELECT doc_id, $duckTokens AS w FROM documents)),
         |b AS (SELECT doc_id AS bench_id, s AS bs FROM sh WHERE doc_id < 16),
         |c AS (SELECT doc_id AS corpus_id, s AS cs FROM sh),
         |flagged AS (
         |  SELECT DISTINCT corpus_id
         |  FROM c JOIN b ON len(list_intersect(cs, bs)) / len(bs) >= 0.5)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT corpus_id FROM flagged)""".stripMargin,

    // survivors = everything minus non-canonical cluster members (same
    // closure as q_dedup_clusters, applied as an anti-join)
    "q_dedup_corpus" ->
      s"""WITH RECURSIVE sets AS (
         |  SELECT doc_id AS id, source AS blk, list_distinct($duckTokens) AS w FROM documents),
         |pairs AS (
         |  SELECT a.id AS id1, b.id AS id2
         |  FROM sets a JOIN sets b ON a.id < b.id AND a.blk = b.blk
         |  WHERE len(list_intersect(a.w, b.w)) / len(list_distinct(list_concat(a.w, b.w))) >= 0.8),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION
         |  SELECT id2 AS src, id1 AS dst FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |losers AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) <> a)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    "q_curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source, text,
         |    $nTokSql AS n_tokens, $langPredSql AS lang_pred, $qualitySql AS quality
         |  FROM documents),
         |filtered AS (
         |  SELECT * FROM scored
         |  WHERE quality >= 0.5 AND n_tokens >= 10 AND lang_pred = lang),
         |deduped AS (
         |  SELECT doc_id, lang, source, n_tokens, quality,
         |    ROW_NUMBER() OVER (PARTITION BY $vocabHashSql ORDER BY doc_id) AS rn
         |  FROM filtered)
         |SELECT doc_id, lang, source, n_tokens, quality FROM deduped WHERE rn = 1""".stripMargin,

    // video frame counts are the GIF fixture's analytic frame formula — the
    // REAL ImageIO reader walks the generated container and must agree
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id, UNNEST(RANGE(0, 2 + (doc_id * 5) % 9, 10)) AS frame_idx
        |FROM documents WHERE (doc_id % 3) = 2""".stripMargin,

    // image rows (doc_id % 3 = 0) carry a REAL generated BMP that Spark
    // decodes with javax.imageio; audio rows (doc_id % 3 = 1) a REAL
    // generated WAV decoded with javax.sound.sampled; video rows
    // (doc_id % 3 = 2) a REAL generated multi-frame GIF decoded by
    // ImageIO's GIF reader. The oracle predicts what the decoders read
    // back via the synthetic-geometry formulas (uniform gray fill =>
    // brightness is exactly the gray level; uncompressed 24bpp BMP =>
    // size = 54 + height * 4-byte-padded rows; constant-amplitude square
    // wave => mean |sample| is exactly A and WAV size = 44 + 2*n; the GIF
    // uses the uncompressed-LZW trick — min code size 7, every code one
    // byte, CLEAR every 126 pixels — so its size is 398 + frames *
    // (12 + data + subblocks) in closed form, and its palette maps index
    // i to gray 2i so frame k's decoded level is exactly
    // 2*((id*11 + k*7) % 128)).
    "q_multimodal_features" ->
      """WITH geo AS (
        |  SELECT doc_id,
        |    (10 + doc_id % 7) * (8 + (doc_id * 3) % 6) AS gif_px,
        |    2 + (doc_id * 5) % 9 AS gif_frames
        |  FROM documents),
        |gif AS (
        |  SELECT doc_id, gif_frames,
        |    gif_px + (gif_px + 125) // 126 + 1 AS gif_db
        |  FROM geo)
        |SELECT d.doc_id AS media_id,
        |  ['image','audio','video'][(d.doc_id % 3) + 1] AS kind,
        |  CASE WHEN d.doc_id % 3 = 0
        |       THEN 54 + (16 + (d.doc_id * 7) % 11) * (((16 + d.doc_id % 13) * 3 + 3) // 4 * 4)
        |       WHEN d.doc_id % 3 = 1 THEN 44 + 2 * (400 + (d.doc_id * 13) % 600)
        |       ELSE 398 + g.gif_frames * (12 + g.gif_db + (g.gif_db + 254) // 255)
        |       END AS n_bytes,
        |  CASE WHEN d.doc_id % 3 = 0 THEN 16 + d.doc_id % 13
        |       WHEN d.doc_id % 3 = 1 THEN 8000 + (d.doc_id % 5) * 2000
        |       ELSE 10 + d.doc_id % 7 END AS width,
        |  CASE WHEN d.doc_id % 3 = 0 THEN 16 + (d.doc_id * 7) % 11
        |       WHEN d.doc_id % 3 = 1 THEN 1
        |       ELSE 8 + (d.doc_id * 3) % 6 END AS height,
        |  CASE WHEN d.doc_id % 3 = 2 THEN g.gif_frames
        |       WHEN d.doc_id % 3 = 1 THEN 400 + (d.doc_id * 13) % 600
        |       ELSE 1 END AS n_frames,
        |  CASE WHEN d.doc_id % 3 = 0 THEN CAST((d.doc_id * 37) % 256 AS DOUBLE)
        |       WHEN d.doc_id % 3 = 1 THEN CAST(1000 + (d.doc_id * 31) % 20000 AS DOUBLE)
        |       ELSE list_aggregate(list_transform(range(0, g.gif_frames),
        |              k -> 2 * ((d.doc_id * 11 + k * 7) % 128)), 'sum')
        |         / CAST(g.gif_frames AS DOUBLE) END AS brightness
        |FROM documents d JOIN gif g ON g.doc_id = d.doc_id""".stripMargin,

    // closed-form aHash replay: the gradient gray plane is linear in (x, y),
    // so every 8x8 cell sum is a polynomial in the cell bounds; the bit rule
    // is the operator's exact cross-multiplied integer comparison, and the
    // hex string assembles nibble-by-nibble (most significant first) so no
    // 64-bit signed arithmetic is ever needed
    "q_image_ahash" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 13 AS w, 16 + (doc_id * 7) % 11 AS h,
        |    1 + doc_id % 3 AS ax, 1 + doc_id % 2 AS by, doc_id % 40 AS c
        |  FROM documents WHERE doc_id % 3 = 0),
        |cells AS (
        |  SELECT media_id, w, h, ax, by, c, jj.j AS j, ii.i AS i,
        |    (ii.i * w) // 8 AS x0,
        |    GREATEST((ii.i * w) // 8 + 1, ((ii.i + 1) * w) // 8) AS x1,
        |    (jj.j * h) // 8 AS y0,
        |    GREATEST((jj.j * h) // 8 + 1, ((jj.j + 1) * h) // 8) AS y1
        |  FROM img, generate_series(0, 7) AS ii(i), generate_series(0, 7) AS jj(j)),
        |bits AS (
        |  SELECT media_id, j * 8 + i AS k,
        |    CASE WHEN
        |      (ax * (((x0 + x1 - 1) * (x1 - x0)) // 2) * (y1 - y0)
        |       + by * (((y0 + y1 - 1) * (y1 - y0)) // 2) * (x1 - x0)
        |       + c * (x1 - x0) * (y1 - y0)) * (w * h)
        |      >
        |      (ax * (((w - 1) * w) // 2) * h
        |       + by * (((h - 1) * h) // 2) * w
        |       + c * w * h) * ((x1 - x0) * (y1 - y0))
        |    THEN 1 ELSE 0 END AS b
        |  FROM cells),
        |nib AS (
        |  SELECT media_id, k // 4 AS n,
        |    SUM(b * CASE k % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END) AS v
        |  FROM bits GROUP BY 1, 2),
        |hx AS (
        |  SELECT media_id,
        |    string_agg(substr('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY n DESC) AS ahash_hex
        |  FROM nib GROUP BY media_id),
        |nb AS (SELECT media_id, CAST(SUM(b) AS INT) AS n_bits FROM bits GROUP BY media_id)
        |SELECT media_id, ahash_hex, n_bits FROM hx JOIN nb USING (media_id)""".stripMargin,

    // closed-form audio-signature replay: window k of track id plays at
    // exactly 500 + 250*((id + k) % 8); window lengths tile n = 400 +
    // (id*13) % 600 samples by the same integer bounds the decoder uses
    // structure-stating oracle (same class as the planted-dup fixtures):
    // the pattern-GIF fixture plants one shared frame per consecutive
    // video-id pair (6g+2, 6g+5) at Hamming 1 and independent 64-bit
    // patterns everywhere else, so the exact expected output is the pair
    // list itself — the engine has to reproduce it through the real
    // encode/decode/hash/join pipeline, the oracle through arithmetic
    "q_video_near_dup" ->
      """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2)
        |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
        |  CAST(1 AS BIGINT) AS n_frame_pairs
        |FROM v a JOIN v b ON b.doc_id = a.doc_id + 3 AND a.doc_id % 6 = 2""".stripMargin,

    "q_audio_signature" ->
      """WITH trk AS (
        |  SELECT doc_id AS media_id, 400 + (doc_id * 13) % 600 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |win AS (
        |  SELECT media_id, n, kk.k AS k,
        |    ((kk.k + 1) * n) // 64 - (kk.k * n) // 64 AS len,
        |    500 + 250 * ((media_id + kk.k) % 8) AS amp
        |  FROM trk, generate_series(0, 63) AS kk(k)),
        |tot AS (SELECT media_id, SUM(amp * len) AS total FROM win GROUP BY media_id),
        |bits AS (
        |  SELECT w.media_id, w.k,
        |    CASE WHEN w.amp * w.len * w.n > t.total * w.len THEN 1 ELSE 0 END AS b
        |  FROM win w JOIN tot t USING (media_id)),
        |nib AS (
        |  SELECT media_id, k // 4 AS nn,
        |    SUM(b * CASE k % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END) AS v
        |  FROM bits GROUP BY 1, 2),
        |hx AS (
        |  SELECT media_id,
        |    string_agg(substr('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY nn DESC) AS asig_hex
        |  FROM nib GROUP BY media_id),
        |nb AS (SELECT media_id, CAST(SUM(b) AS INT) AS n_bits FROM bits GROUP BY media_id)
        |SELECT media_id, asig_hex, n_bits FROM hx JOIN nb USING (media_id)""".stripMargin
  )
}
