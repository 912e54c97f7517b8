package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication for training-data pipelines, at four fidelity/cost
 * points. All operators take a DataFrame with (`idCol`: long, `textCol`:
 * string) and are pure Spark built-ins — no UDFs, no driver-side loops — so
 * each one distributes: the only shuffles are the stated groupBy/join keys.
 *
 *  - exact:        one shuffle on the content hash. O(N).
 *  - minhash LSH:  banded MinHash — near-dup candidates meet in band buckets,
 *                  then exact-Jaccard verify. O(N·bands) + bucket joins; the
 *                  100 TB scale path (never quadratic).
 *  - simhash:      32-bit fingerprints, four-8-bit-chunk blocking
 *                  (pigeonhole: any pair within Hamming distance 3 shares an
 *                  exact 8-bit chunk), xor-popcount verify.
 *  - ngram Jaccard: exact quadratic verify within blocks — the oracle-able
 *                  ground truth; use only on bounded block sizes.
 */
object Dedup {

  /** Keep the lowest-id document per exact text content. One shuffle. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(trim(col(textCol)))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Exact-duplicate groups: content hash -> group size + kept id. */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(trim(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  // --- MinHash LSH ---

  /** Distinct 64-bit hashes of the word `shingleSize`-gram shingles. The
    * expensive string work (tokenize, build shingles, hash them) happens in
    * ONE native expression pass ([[graft.functions.WordShingleHashes]] —
    * ~100x over the interpreted HOF chain); every minhash/band/Jaccard step
    * downstream operates on the long array. Hash collisions are negligible
    * at 64 bits. */
  def shingleHashes(textCol: Column, shingleSize: Int = 3): Column =
    // sorted: minhash re-hashing is order-independent, and the verification
    // stage's merge-walk intersection requires sorted inputs
    graft.functions.VectorExpressions.wordShingleHashes(textCol, shingleSize, sorted = true)

  /** One minhash value derived from pre-hashed shingles: min of a cheap
    * seeded re-hash of each 64-bit shingle hash. */
  def minhashFromHashes(hashes: Column, seed: Int): Column =
    array_min(transform(hashes, h => xxhash64(lit(seed), h)))

  /** 64-bit MinHash signature for `numHashes` seeded hash functions over word
    * `shingleSize`-gram shingles — one native pass over the shingle hashes
    * ([[graft.functions.MinHashes]]; element s equals
    * `minhashFromHashes(hs, s)`, pinned in DedupSpec). */
  def minhashSignature(textCol: Column, numHashes: Int = 16, shingleSize: Int = 3): Column =
    graft.functions.VectorExpressions.minHashes(shingleHashes(textCol, shingleSize), numHashes)

  /** THE band-bucket key of LSH band `b` over a MinHash signature column:
    * every near-dup path (batch mining, the streaming index) must derive its
    * buckets from this one definition, or signatures written by one path
    * would never collide with the other's. */
  private[graft] def bandHash(mh: Column, b: Int, rowsPerBand: Int): Column =
    xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
      element_at(mh, b * rowsPerBand + r + 1)): _*)

  /** Exact Jaccard of two SORTED hash-set columns: one codegen'd merge walk
    * per pair, `|A∪B| = |A|+|B|-|A∩B|`. Shared by every verification stage. */
  private[graft] def sortedSetJaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.VectorExpressions.sortedIntersectSize(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Near-duplicate pairs via banded MinHash LSH + exact shingle-Jaccard
    * verification. Output: (id1, id2, jaccard) with id1 < id2, jaccard >=
    * `threshold`. bands*rowsPerBand hash functions are used. */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    minhashPairsFromHashes(prepHashes(docs, idCol, textCol, shingleSize),
      threshold, bands, rowsPerBand)
  }

  /** The checkpointed `(id, hs)` shingle-hash frame every LSH miner starts
    * from. localCheckpoint is a materialization barrier: without it
    * Catalyst's CollapseProject re-inlines the tokenize+shingle+hash
    * expression into every minhash/band reference and into both sides of
    * the join — measured ~20x slowdown at sf0.1. The checkpointed frame is
    * small: one (id, ~doc-length longs) row per doc, and it is reused by
    * both the banding and the verification stage (and, in
    * [[dedupAgainstCorpus]], across BOTH mining stages). */
  private def prepHashes(
      docs: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("hs"))
      .localCheckpoint()

  /** [[minhashNearDupPairs]] over an already-prepped `(id, hs)` frame. */
  private def minhashPairsFromHashes(
      hs: DataFrame, threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = bandBuckets(hs, bands, rowsPerBand)

    // candidates: ids meeting in the same (band, band_hash) bucket
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()

    // exact Jaccard verification on the hashed shingle sets: codegen'd merge
    // walk per pair (inputs sorted by shingleHashes), |A∪B| = |A|+|B|-|A∩B|
    candidates
      .join(hs.select(col("id").as("id1"), col("hs").as("sh1")), "id1")
      .join(hs.select(col("id").as("id2"), col("hs").as("sh2")), "id2")
      .withColumn("jaccard", sortedSetJaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** `(id, band, band_hash)` LSH bucket rows for a checkpointed
    * `(id, hs)` shingle-hash frame. All bands*rowsPerBand minhashes in ONE
    * native array walk ([[graft.functions.MinHashes]]), then per-band hashes
    * over plain element_at references — the HOF form walked the array once
    * per minhash with an interpreted lambda per element. MinHashes is
    * non-cheap, so CollapseProject keeps it a single evaluation rather than
    * inlining it into the band references. Shared by the self-join miner and
    * the cross-corpus miner, so their buckets are identical by construction. */
  private def bandBuckets(hs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val mh = hs.select(col("id"),
      graft.functions.VectorExpressions.minHashes(col("hs"), bands * rowsPerBand).as("mh"))
    mh.select(col("id"), posexplode(
      array((0 until bands).map(bandHash(col("mh"), _, rowsPerBand)): _*))
      .as(Seq("band", "band_hash")))
  }

  /**
   * Cross-corpus near-duplicate pairs via the same banded MinHash LSH as
   * [[minhashNearDupPairs]], between a NEW batch and an EXISTING corpus —
   * the batch-ingestion dedup primitive ("is anything in this delivery
   * already in the lake?"). Both sides derive their buckets from the one
   * [[bandHash]] definition, so candidates meet in (band, band_hash)
   * equi-join buckets: one shuffle per side, never |new|×|corpus|; only
   * bucket-colliding pairs pay the exact-Jaccard verify. Output
   * (left_id, right_id, jaccard) with jaccard >= `threshold` — left ids
   * from `left`, right ids from `right`. The batch twin of
   * [[graft.streaming.StreamingCorpusDedup]]'s per-micro-batch index probe.
   */
  def crossNearDupPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame =
    crossPairsFromHashes(
      prepHashes(left, idCol, textCol, shingleSize),
      prepHashes(right, idCol, textCol, shingleSize),
      threshold, bands, rowsPerBand)

  /** [[crossNearDupPairs]] over already-prepped `(id, hs)` frames. */
  private def crossPairsFromHashes(
      lh: DataFrame, rh: DataFrame,
      threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val candidates = bandBuckets(lh, bands, rowsPerBand).as("a")
      .join(bandBuckets(rh, bands, rowsPerBand).as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.id").as("left_id"), col("b.id").as("right_id"))
      .distinct()
    candidates
      .join(lh.select(col("id").as("left_id"), col("hs").as("sh1")), "left_id")
      .join(rh.select(col("id").as("right_id"), col("hs").as("sh2")), "right_id")
      .withColumn("jaccard", sortedSetJaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("left_id", "right_id", "jaccard")
  }

  /**
   * Batch-ingestion dedup, end to end: the accepted subset of `newDocs`
   * after (1) dropping every new doc that is a near-dup of the EXISTING
   * corpus ([[crossNearDupPairs]]) and (2) keeping one canonical doc per
   * near-dup cluster WITHIN the survivors ([[minhashNearDupPairs]] →
   * [[keepCanonical]]). Both stages are banded LSH — the whole composition
   * is shuffle-bounded by bucket keys, never quadratic in either corpus.
   */
  def dedupAgainstCorpus(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    // the expensive tokenize->shingle->hash pass runs ONCE per side; the
    // in-batch mining reuses the new side's checkpointed hashes (filtered to
    // the survivors) instead of re-deriving them from the text
    val newHs = prepHashes(newDocs, idCol, textCol, shingleSize)
    val corpusHs = prepHashes(corpus, idCol, textCol, shingleSize)
    val rejected = crossPairsFromHashes(newHs, corpusHs, threshold, bands, rowsPerBand)
      .select(col("left_id")).distinct().localCheckpoint() // referenced by BOTH anti-joins
    val novel = newDocs.join(rejected, newDocs(idCol) === col("left_id"), "left_anti")
    // checkpointed like every frame fed to the miner: the band self-join and
    // both verify joins reference it, and without the barrier the anti-join
    // subtree re-executes per reference
    val novelHs = newHs.join(rejected, newHs("id") === col("left_id"), "left_anti")
      .localCheckpoint()
    keepCanonical(novel,
      minhashPairsFromHashes(novelHs, threshold, bands, rowsPerBand), idCol)
  }

  // --- SimHash ---

  /** 32-bit SimHash from pre-hashed tokens: bit i is set iff the sum of
    * (+1/-1) contributions of token-hash bit i over all tokens is positive.
    * One native pass ([[graft.functions.SimHash32FromHashes]]); the
    * composable HOF formulation is kept as [[simhashFromHashesHof]] and the
    * two are pinned equal in DedupSpec. */
  def simhashFromHashes(tokenHashes: Column): Column =
    graft.functions.VectorExpressions.simHash32FromHashes(tokenHashes)

  /** 64-bit SimHash from pre-hashed tokens — same vote rule over all 64
    * hash bits. This is the PRODUCTION width: 16-bit chunk blocking over a
    * 64-bit signature is 65,536-way, vs only 256-way for 8-bit chunks of the
    * 32-bit form, so the within-block quadratic stays bounded at corpus
    * scale. One native pass ([[graft.functions.SimHash64FromHashes]]). */
  def simhashFromHashes64(tokenHashes: Column): Column =
    graft.functions.VectorExpressions.simHash64FromHashes(tokenHashes)

  /** Reference formulation of [[simhashFromHashes]]/[[simhashFromHashes64]]
    * via built-in HOFs: `width` interpreted `aggregate` walks per row —
    * semantically the spec, kept for the parity pin; never use on a hot
    * path. */
  def simhashFromHashesHof(tokenHashes: Column, width: Int = 32): Column = {
    require(width == 32 || width == 64, s"SimHash width must be 32 or 64, was $width")
    val bits = (0 until width).map { i =>
      val votes = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** 32-bit SimHash of the token multiset. */
  def simhash32(textCol: Column): Column =
    simhashFromHashes(transform(tokens(textCol), t => xxhash64(t)))

  /** 64-bit SimHash of the token multiset. */
  def simhash64(textCol: Column): Column =
    simhashFromHashes64(transform(tokens(textCol), t => xxhash64(t)))

  /** Near-dup pairs by SimHash, blocked on the four 16-bit chunks of the
    * 64-bit hash: by pigeonhole, any pair within Hamming distance <= 3 has
    * at least one chunk with zero differing bits, so recall is GUARANTEED up
    * to the default `maxHamming = 3`; the full-popcount verify keeps
    * precision exact. (`maxHamming > 3` still works but recall is no longer
    * guaranteed — documented blocking trade-off.)
    *
    * Scale shape: each chunk key has 2^16 = 65,536 distinct values, so the
    * four block self-joins are O(N²/65,536) in the worst (uniform) case —
    * 256× fewer candidate comparisons than the 8-bit chunks a 32-bit
    * signature would allow. The quadratic is confined to same-chunk blocks;
    * AQE's skew-join splitting handles a hot chunk value. */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame =
    // fully fused: tokenize+hash (WordShingleHashes) -> 64-bit vote
    // (SimHash64FromHashes) is ONE composed native evaluation per row
    hammingNearDupPairs(
      docs.select(col(idCol),
        simhashFromHashes64(
          graft.functions.VectorExpressions.wordShingleHashes(col(textCol), 1, distinct = false))
          .as("__sh")),
      idCol, "__sh", maxHamming)

  /** Near-dup pairs among arbitrary 64-bit fingerprints by Hamming
    * distance — the blocking engine behind [[simhashNearDupPairs]], exposed
    * for any perceptual fingerprint (image aHash, audio signature, ...):
    * blocks on the four 16-bit chunks (pigeonhole recall to the documented
    * Hamming-3 guarantee), exact xor-popcount verify inside blocks. The
    * (id, hash) frame is checkpointed once: it feeds eight plan branches
    * (4 blocks x 2 join sides) which would otherwise each recompute the
    * fingerprints from scratch. */
  def hammingNearDupPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    val shBase = hashes
      .select(col(idCol).as("id"), col(hashCol).cast("long").as("sh"))
      .localCheckpoint()
    val sh = shBase.select(col("id") +: col("sh") +:
      (0 until 4).map(c => shiftright(col("sh"), c * 16).bitwiseAND(0xFFFFL).as(s"c$c")): _*)

    def block(key: String) =
      sh.as("a").join(sh.as("b"),
          col(s"a.$key") === col(s"b.$key") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.sh").as("sh1"), col("b.sh").as("sh2"))

    (0 until 4).map(c => block(s"c$c")).reduce(_.union(_)).distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  // --- cross-corpus contamination (benchmark/test-set overlap detection) ---

  /** Flag corpus documents that CONTAIN a benchmark document's content:
    * for every (corpus doc, benchmark doc) pair, the fraction of the
    * benchmark doc's distinct word shingles present in the corpus doc
    * (`containment = |C ∩ B| / |B|` — asymmetric by design: a long corpus
    * doc that embeds a whole benchmark item scores 1.0 where symmetric
    * Jaccard would dilute it to near 0). Pairs with containment >=
    * `threshold` are returned.
    *
    * Scale shape: the benchmark side is small by definition (eval sets), so
    * its exploded shingle table BROADCASTS; the corpus side explodes and
    * streams — one aggregation keyed on (corpus_id, bench_id), never a
    * doc-level cross join. Shingle identity is 64-bit hashes
    * ([[shingleHashes]]), so the counts match the string formulation up to
    * negligible collision odds. */
  def contaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double = 0.5,
      corpusIdCol: String = "doc_id",
      corpusTextCol: String = "text",
      benchIdCol: String = "doc_id",
      benchTextCol: String = "text",
      shingleSize: Int = 3): DataFrame = {
    val c = corpus.select(col(corpusIdCol).as("corpus_id"),
      explode(shingleHashes(col(corpusTextCol), shingleSize)).as("h"))
    val b = benchmark.select(col(benchIdCol).as("bench_id"),
      shingleHashes(col(benchTextCol), shingleSize).as("bh"))
      .select(col("bench_id"), size(col("bh")).as("bn"), explode(col("bh")).as("h"))
    c.join(broadcast(b), "h")
      .groupBy(col("corpus_id"), col("bench_id"), col("bn"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("containment",
        col("overlap").cast("double") / col("bn").cast("double"))
      .filter(col("containment") >= threshold)
      .select("corpus_id", "bench_id", "containment")
  }

  /** The cut arm of [[contaminationPairs]] — GPT-3-style benchmark
    * decontamination: drop every corpus document whose shingle containment
    * of ANY benchmark document reaches `threshold`. Same scale shape as the
    * measure arm (benchmark broadcasts, corpus streams) plus one anti-join
    * on the flagged id set; survivors keep all their columns. A benchmark
    * that overlaps the corpus (planted eval items) removes the embedding
    * documents — that is the point, not a bug. */
  def removeContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double = 0.5,
      corpusIdCol: String = "doc_id",
      corpusTextCol: String = "text",
      benchIdCol: String = "doc_id",
      benchTextCol: String = "text",
      shingleSize: Int = 3): DataFrame = {
    val flagged = contaminationPairs(corpus, benchmark, threshold,
        corpusIdCol, corpusTextCol, benchIdCol, benchTextCol, shingleSize)
      .select(col("corpus_id")).distinct()
    corpus.join(flagged, corpus(corpusIdCol) === flagged("corpus_id"), "left_anti")
  }

  // --- duplicate clustering (connected components over near-dup pairs) ---

  /** Group near-duplicate PAIRS into duplicate CLUSTERS: connected components
    * over the undirected pair graph, labeling every document with the minimum
    * doc id of its component (the canonical keeper) plus the component size.
    *
    * Output: (doc_id, cluster_id, cluster_size) for every document that
    * appears in at least one pair; `cluster_id = min(doc_id in component)`.
    * Downstream dedup keeps `doc_id == cluster_id` rows and drops the rest —
    * without this step, pairwise output over-deletes (A~B, B~C would drop
    * both B and C only if pairs are followed transitively).
    *
    * Algorithm: iterative min-label propagation to a FIXPOINT — each round,
    * every node takes the min of its own label and its neighbors' labels
    * (one shuffle join + one groupBy per round). Converges in O(component
    * diameter) rounds; near-dup components are dense and tiny (similarity is
    * near-transitive at high thresholds), so 2-4 rounds is typical while the
    * per-round cost stays O(|E|) — never quadratic, no driver-side graph.
    * Lineage is truncated every round (localCheckpoint by default; pass
    * `reliable = true` on a real cluster for fault-tolerant `checkpoint()`
    * rounds that survive executor loss) so the plan does not
    * grow with iterations. `maxIter` bounds pathological chain graphs; hitting
    * it raises rather than returning partial components. `maxClusterSize`
    * (optional) bounds component SIZE: a component larger than the cap fails
    * loudly with the offending cluster ids, because a mega-cluster is almost
    * always boilerplate that should be filtered upstream, and silently
    * carrying it poisons both the canonical choice and downstream cost.
    */
  def dupClusters(
      pairs: DataFrame,
      id1Col: String = "id1",
      id2Col: String = "id2",
      maxIter: Int = 50,
      maxClusterSize: Option[Long] = None,
      reliable: Boolean = false): DataFrame = {
    // per-round lineage truncation: `localCheckpoint` (default) pins blocks
    // in EXECUTOR storage — fast, but on a real cluster a lost executor
    // kills the job mid-iteration (the blocks are not fault-tolerant and not
    // recomputable once lineage is cut). `reliable = true` switches every
    // round to a RELIABLE `checkpoint()` on the session's checkpoint
    // directory (HDFS/S3 on a cluster — set `sc.setCheckpointDir` first), so
    // iteration state survives executor loss at the cost of a write+read per
    // round. Same results either way (convergence laws run under both).
    val spark = pairs.sparkSession
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "dupClusters(reliable = true) needs a checkpoint directory: call " +
        "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first")
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // materialize the pair input ONCE before fanning it into both edge
    // directions: `pairs` is typically an expensive near-dup mining plan
    // (block self-join + per-pair verification), and the union would
    // otherwise embed — and execute — that subplan twice
    val p = pin(pairs.select(col(id1Col).as("a"), col(id2Col).as("b")))
    val edges = pin(p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct())
    var labels = pin(edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .select(col("src").as("id"), col("lbl"), lit(null).cast("long").as("own"))
      // one aggregation yields BOTH the new label and the node's previous one
      // (own != null only on the self row), so the fixpoint test is a cheap
      // scan of the checkpointed result — no extra join per round
      val next = pin(labels.select(col("id"), col("lbl"), col("lbl").as("own"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("lbl").as("lbl"), max("own").as("own")))
      converged = next.filter(col("lbl") < col("own")).isEmpty
      labels = next.select("id", "lbl")
      iter += 1
    }
    require(converged, s"dupClusters did not converge within $maxIter rounds")
    val members = labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
    // cluster_size via groupBy + join back, NOT a window over the component:
    // a window partitioned by cluster_id funnels each component through ONE
    // task, so a boilerplate mega-cluster (millions of near-identical docs —
    // common in web corpora) becomes a single-task hot spot. The aggregate
    // is map-side-combinable and AQE can split a skewed join; it cannot
    // split a window partition.
    val sizes = members.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    maxClusterSize.foreach { cap =>
      val giants = sizes.filter(col("cluster_size") > cap)
        .orderBy(col("cluster_size").desc)
        .limit(20)
        .collect()
      require(giants.isEmpty,
        s"dupClusters found component(s) larger than maxClusterSize=$cap — " +
          "almost always boilerplate (headers, templates) that should be " +
          "filtered upstream rather than clustered. Largest offenders " +
          "(cluster_id -> size): " +
          giants.map(r => s"${r.get(0)} -> ${r.getLong(1)}").mkString(", "))
    }
    members.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")
  }

  /** End-to-end near-dup corpus dedup: given mined pairs, keep exactly ONE
    * document per duplicate cluster (the minimum id) plus every document
    * that appears in no pair. This is the transitive completion of pairwise
    * dedup — dropping `id2` of every pair over-deletes when similarity
    * chains (A~B, B~C with A!~C would drop B AND C, leaving only A to
    * represent two distinct near-dup groups... or worse, under blocking,
    * drop documents whose pair partner was itself dropped). One anti-join
    * against the non-canonical cluster members. */
  def keepCanonical(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      id1Col: String = "id1",
      id2Col: String = "id2"): DataFrame = {
    val losers = dupClusters(pairs, id1Col, id2Col)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__loser_id"))
    docs.join(losers, docs(idCol) === col("__loser_id"), "left_anti")
  }

  // --- fuzzy (edit-distance) matching ---

  /**
   * Edit-distance join: all (left, right) pairs with
   * `levenshtein(leftCol, rightCol) <= maxDistance` — the standard
   * entity-resolution / fuzzy-match shape. Length-banded so it is a shuffle
   * EQUI-join, not a cross join: `levenshtein <= k` implies
   * `|len(a) - len(b)| <= k`, so the right side is exploded to the 2k+1
   * length buckets a match could inhabit and joined on the left's exact
   * length — each qualifying pair meets exactly once, recall is exact, and
   * the quadratic work is confined to same-length-band bucket pairs.
   * The distance itself uses Spark's thresholded levenshtein (banded DP,
   * O(k·n) per pair instead of O(n²)).
   * Output: (left_id, left_str, right_id, right_str, distance).
   *
   * Length alone is a LOW-CARDINALITY key (skew at corpus scale: every
   * same-length pair meets); for large inputs pass `blockCols` — a
   * (leftCol, rightCol) equality pair such as a category, language, or
   * source — to bound the quadratic work per block, exactly like
   * [[ngramJaccardPairs]]' `blockCol`. Pairs in different blocks are then
   * (deliberately) never compared.
   */
  def editDistanceJoin(
      left: DataFrame, right: DataFrame,
      leftId: String, leftCol: String,
      rightId: String, rightCol: String,
      maxDistance: Int,
      blockCols: Option[(String, String)] = None): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, was $maxDistance")
    val l = left.select(col(leftId).as("left_id") +: col(leftCol).as("left_str") +:
        blockCols.map(b => col(b._1).as("__lblk")).toSeq: _*)
      .withColumn("__band", length(col("left_str")))
    val r = right.select(col(rightId).as("right_id") +: col(rightCol).as("right_str") +:
        blockCols.map(b => col(b._2).as("__rblk")).toSeq: _*)
      .withColumn("__band", explode(sequence(
        length(col("right_str")) - maxDistance,
        length(col("right_str")) + maxDistance)))
    val joined = blockCols match {
      case None    => l.join(r, "__band")
      case Some(_) => l.join(r, l("__band") === r("__band") && col("__lblk") === col("__rblk"))
    }
    joined
      .withColumn("distance",
        levenshtein(col("left_str"), col("right_str"), maxDistance))
      .filter(col("distance") >= 0) // thresholded levenshtein returns -1 above the bound
      .select("left_id", "left_str", "right_id", "right_str", "distance")
  }

  // --- exact n-gram Jaccard (quadratic ground truth) ---

  /** All pairs with word-set Jaccard >= `threshold`. Quadratic in the block —
    * the oracle-able ground truth for the LSH paths. `blockCol` (optional)
    * restricts pairs to equal values of that column, turning the cross join
    * into an equi-join and bounding the quadratic blow-up; pass None only on
    * small inputs. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      blockCol: Option[String] = None): DataFrame = {
    // compare hashed word sets (64-bit): set sizes and intersections are
    // identical to the string formulation up to negligible collision odds,
    // and long-array intersects are several times cheaper than string ones
    // sorted hash sets: the per-pair intersection below is a codegen'd merge
    // walk (no per-pair hash-set build) — the sort is paid once per DOC, the
    // walk once per PAIR, and pairs outnumber docs by orders of magnitude
    val cols = col(idCol).as("id") +:
      graft.functions.VectorExpressions.wordShingleHashes(col(textCol), 1, sorted = true).as("w") +:
      blockCol.map(c => col(c).as("blk")).toSeq
    val sets = docs.select(cols: _*).withColumn("n", size(col("w"))).localCheckpoint()
    // positional size filter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so pairs
    // whose sizes differ by more than the threshold ratio can't qualify —
    // pruned INSIDE the join condition, before any set intersection runs
    val sizePrune =
      col("a.n") >= col("b.n") * threshold && col("b.n") >= col("a.n") * threshold
    val cond0 = col("a.id") < col("b.id") && sizePrune
    val cond = blockCol match {
      case Some(_) => cond0 && col("a.blk") === col("b.blk")
      case None    => cond0
    }
    // |A∪B| = |A|+|B|-|A∩B|: one merge walk per pair, no second traversal
    sets.as("a").join(sets.as("b"), cond)
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectSize(col("a.w"), col("b.w"))
          .cast("double"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (col("inter") / (col("a.n") + col("b.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
