package graft.operators

import graft.functions.NativeTextExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-similarity join by PREFIX FILTERING (the PPJoin/AllPairs family):
  * exact all-pairs Jaccard ≥ t over word n-gram sets, generating
  * candidates from a length-dependent PREFIX of each document's grams
  * instead of the full inverted index that [[Dedup.ngramJaccardAllPairs]]
  * (q80) builds over the same gram domain.
  *
  * The pruning argument: order every document's distinct grams by global
  * rarity (ascending document frequency, gram hash as tie-break) and keep
  * only the first |d| − ⌈t·|d|⌉ + 1 as its prefix. Two sets with
  * Jaccard ≥ t must overlap in ≥ ⌈t·max(|a|,|b|)⌉ grams, so they cannot
  * avoid sharing at least one PREFIX gram — candidates from prefix
  * collisions are therefore LOSSLESS (recall 1.0, asserted against brute
  * force in spec), while the index shrinks two ways at once: only ~(1−t)
  * of each document's grams are indexed, and those are its RAREST, so the
  * per-gram candidate fan-out (Σ df²) collapses exactly where the full
  * inverted index skews worst — boilerplate grams never enter a prefix at
  * high t. At 100 TB this is the difference between the join exploding on
  * the 10⁸-doc posting list and never materializing it.
  *
  * Grams are XXH64 hashes from the native `word_ngram_hashes` (q80's
  * stance: Spark joins on hashes, the oracle joins on strings, identical
  * pair sets verify the hashed path; 2⁻⁶⁴ collision budget). Hashing is
  * also the hot-path win: one native pass per document replaces the
  * interpreted HOF gram build, and every downstream compare is a long,
  * not a string (measured 2.5× end to end at sf0.1).
  *
  * Plan shape: one scan → native gram explode; one shuffle on gram hash
  * for df; one shuffle on id to assemble ordered sets (staged once —
  * three consumers); prefix self-join shuffles on the (rare) prefix gram;
  * then two hash joins back to the set table for the exact verify, with
  * the pair dedup placed AFTER the verify while the set table broadcasts
  * (duplicates stay in-pipeline; only output-sized rows shuffle) and
  * BEFORE it once the verify joins must shuffle.
  */
object PrefixJoin {
  // not the Logging trait: its `log` member shadows functions.log used in
  // the tf-idf weighting below
  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Gate override with a validating parse: a typo'd value fails with a
    * message naming the conf key, not a bare NumberFormatException.
    */
  private def bruteMaxDocs(docs: DataFrame): Long = {
    val key = "spark.graft.prefixJoin.bruteMaxDocs"
    docs.sparkSession.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be an integer, got '$raw'"))
    }.getOrElse(20000L)
  }

  /** Rows per packed block in the brute regime's blocked all-pairs verify
    * (r19). 0 disables blocking (the r18 per-pair nested-loop join —
    * kept as the reference form the equality spec pins against). The
    * default balances kernel amortization against task granularity: at
    * the gate's 20k-doc ceiling it yields ~625 blocks ≈ 195k block pairs,
    * each one ~32² fused merge loops.
    */
  private def bruteBlockRows(docs: DataFrame): Int = {
    val key = "spark.graft.prefixJoin.bruteBlockRows"
    docs.sparkSession.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be an integer, got '$raw'"))
    }.getOrElse(32)
  }

  /** The jaccard brute branch keeps the per-pair NLJ by DEFAULT: blocking
    * was a measured negative there (sf1 shape: NLJ 6.9 s vs blocked 8.9 s
    * even with the length filter + positional early exit; sf0.1: 2.36 vs
    * 2.60) — gram sets are long, so the merge loop dominates and the
    * whole-stage-codegen per-pair loop beats the kernel's per step, where
    * the SHORT tf-idf vectors of the cosine branch are row-overhead-bound
    * and blocking wins (q203 29.3 → 20.7 s at sf1). Same key shape so the
    * equality spec can still force either form.
    */
  private def jaccardBruteBlockRows(docs: DataFrame): Int = {
    val key = "spark.graft.prefixJoin.jaccardBruteBlockRows"
    docs.sparkSession.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be an integer, got '$raw'"))
    }.getOrElse(0)
  }

  /** Assign each row a deterministic block id (hash of `id`, never RNG —
    * retried tasks must reproduce the assignment) targeting `blockRows`
    * rows per block. Block membership is a physical layout choice: the
    * blocked verify evaluates EVERY block pair, so any assignment yields
    * the identical pair set.
    */
  private def withBlockId(df: DataFrame, nRows: Long, blockRows: Int): DataFrame = {
    val nBlocks = math.max(1L, (nRows + blockRows - 1) / blockRows)
    df.withColumn("bid", pmod(xxhash64(col("id")), lit(nBlocks)))
  }

  /** Exact (id_a, id_b, jaccard) pairs with Jaccard ≥ `threshold` over
    * distinct word `n`-grams (clipped q80-style: a doc shorter than n
    * contributes its whole text as one gram), id_a < id_b.
    */
  def jaccardPrefixJoin(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sets = Dedup.stage(orderedSets(docs, idCol, textCol, n), "prefixjoin-sets")
    // Same cost-gated physical strategy as [[weightedCosinePrefixJoin]]:
    // under the gate, n²/2 codegen'd merge-Jaccards through one
    // broadcast nested-loop join beat the posting self-join + pair
    // dedup + two verify joins. sets is already staged, so the gate's
    // count() is parquet metadata, and the set arrays re-sort by gram
    // hash (orderedSets orders by rarity; the merge needs value order).
    val bruteMax = bruteMaxDocs(docs)
    val nSets = sets.count()
    if (nSets <= bruteMax) {
      val sorted = sets.select(col("id"), array_sort(col("toks")).as("toks"))
      val fanout = graft.GraftConf.explosiveFanout(docs.sparkSession)
      val blockRows = jaccardBruteBlockRows(docs)
      if (blockRows > 0) {
        // blocked verify, conf-opt-in only (see [[jaccardBruteBlockRows]]
        // — a measured NEGATIVE for long gram sets, kept for the
        // equality spec and for short-set corpora). The jaccard division
        // is jaccard_sorted's own integer-exact IEEE division, so the
        // ≥ t cut is identical (spec pins blocked == NLJ row-for-row).
        val blocks = withBlockId(sorted, nSets, blockRows)
          .groupBy(col("bid"))
          .agg(expr("pack_long_set_block(collect_list(struct(id, toks)))").as("blob"))
        return blocks.repartition(fanout).as("a")
          .join(broadcast(blocks).as("b"), col("a.bid") <= col("b.bid"))
          .select(explode(expr(
            s"jaccard_block_pairs(a.blob, b.blob, $threshold, a.bid = b.bid)")).as("e"))
          .select(col("e.id_a").as("id_a"), col("e.id_b").as("id_b"),
            col("e.jaccard").as("jaccard"))
      }
      return sorted.repartition(fanout)
        .select(col("id").as("id_a"), col("toks").as("ta"))
        .join(broadcast(sorted.select(col("id").as("id_b"), col("toks").as("tb"))),
          col("id_a") < col("id_b"))
        .withColumn("jaccard", expr("jaccard_sorted(ta, tb)"))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    val prefix = prefixPostings(sets, threshold)
    // same explosive-join parallelism pin as [[weightedCosinePrefixJoin]]:
    // AQE sizes this join by its (tiny) posting inputs, not its O(Σ df²)
    // output — fan the stream side out explicitly while the build side
    // fits a broadcast
    // fan out BY ID so pair duplicates co-locate and the post-verify
    // dedup collapses them in its partial aggregation (see the weighted
    // variant for the measurement)
    val fanout = graft.GraftConf.explosiveFanout(docs.sparkSession)
    // Broadcast gate on BYTES, not row count: the verify side carries the
    // full gram arrays (one long per gram), so a long-document corpus can
    // push a 200k-row table to GBs. `sets` is already staged, so this agg
    // is a cheap parquet scan; the posting table is strictly smaller than
    // `sets`, so one measurement gates both broadcasts.
    val setsBytes = sets.agg(coalesce(sum(col("sz")), lit(0L)))
      .head.getLong(0) * 8L + nSets * 32L
    val fitsBroadcast = setsBytes <= graft.GraftConf.broadcastBytes(docs.sparkSession)
    // log the regime like every other byte gate: the sf20 tier crossed
    // this one NATURALLY (1M docs pushed the gram table past the 1 GiB
    // heap-derived cap) and the 3.6x step was undiagnosable from a
    // silent flip
    logger.info(s"jaccardPrefixJoin verify: ${if (fitsBroadcast) "BROADCAST" else "SHUFFLE"}" +
      s" regime (set table ~$setsBytes B vs gate " +
      s"${graft.GraftConf.broadcastBytes(docs.sparkSession)} B, $nSets docs)")
    val rawPairs = (
      if (fitsBroadcast)
        prefix.repartition(fanout, col("id")).as("a").join(broadcast(prefix).as("b"),
          col("a.ptok") === col("b.ptok") && col("a.id") < col("b.id"))
      else
        // Shuffle regime: the pin is STILL required (measured at 250k
        // docs: the posting input is ~50 MB, so AQE coalesced the join
        // exchange onto 1–2 tasks while the output exploded — 3/32
        // cores busy). Repartition BOTH sides on the join key with the
        // pinned fan-out: co-partitioned, so the join adds no further
        // exchange, and user repartitions are exempt from AQE
        // coalescing. Per-key skew is bounded by the prefix filter
        // itself (only a doc's rarest grams are indexed).
        prefix.repartition(fanout, col("ptok")).as("a")
          .join(prefix.repartition(fanout, col("ptok")).as("b"),
            col("a.ptok") === col("b.ptok") && col("a.id") < col("b.id"))
      ).select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def verified(cands: DataFrame, hint: DataFrame => DataFrame): DataFrame = cands
      .join(hint(sets.select(col("id").as("id_a"), col("toks").as("ta"), col("sz").as("sza"))), "id_a")
      .join(hint(sets.select(col("id").as("id_b"), col("toks").as("tb"), col("sz").as("szb"))), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // Same two-regime verify as [[weightedCosinePrefixJoin]]: while the
    // set table broadcasts, duplicated raw pairs (one per shared prefix
    // gram) cost an extra in-pipeline intersect each, so dedup AFTER the
    // map-side verify where only output-sized rows shuffle; past the
    // cutoff the verify joins shuffle anyway — dedup the pair stream
    // first so duplicates never ride an exchange. The dedup's own
    // exchange is pinned to the fan-out width (a plain dropDuplicates
    // exchanges the raw stream at spark.sql.shuffle.partitions — at the
    // 250k-doc shape that put ~10⁸ rows per aggregate task, whose hash
    // map fell back to a sort that spilled the whole stream to disk),
    // and the set-table joins are hinted SHUFFLE_HASH: a sort-merge join
    // would SORT the candidate stream (and, on the second join, the
    // gram arrays attached by the first) — the build side is the small
    // set table, so hash joins stream the candidates sort-free.
    if (fitsBroadcast) verified(rawPairs, broadcast(_)).dropDuplicates("id_a", "id_b")
    else verified(
      rawPairs.repartition(fanout, col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b"),
      _.hint("shuffle_hash"))
  }

  /** Candidate-pair counts of the prefix index vs the full inverted index
    * over the same gram sets — the pruning-effectiveness diagnostic the
    * spec gates on (prefix ≤ full always).
    */
  def candidateCounts(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3): (Long, Long) = {
    val sets = Dedup.stage(orderedSets(docs, idCol, textCol, n), "prefixjoin-cand")
    val full = sets.select(col("id"), explode(col("toks")).as("tok"))
    val fullCount = full.as("a").join(full.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).dropDuplicates().count()
    val prefix = prefixPostings(sets, threshold)
    val prunedCount = prefix.as("a").join(prefix.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).dropDuplicates().count()
    (prunedCount, fullCount)
  }

  /** (id, toks, sz): each document's distinct gram hashes ordered by
    * ascending global df (hash tie-break), staged by callers — the table
    * feeds the prefix postings AND both sides of the verify join, and
    * without materialization Spark re-executes the scan→explode→df-join→
    * sort pipeline once per consumer.
    */
  private def orderedSets(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    NativeTextExpressions.register(docs.sparkSession)
    // explode_outer: plain explode would push a size()>0 pre-filter that
    // evaluates the native gram expression twice per row (the q80 lesson)
    val toks = docs
      .select(col(idCol).as("id"), expr(s"word_ngram_hashes($textCol, $n)").as("__gs"))
      .select(col("id"), explode_outer(col("__gs")).as("tok"))
      .filter(col("tok").isNotNull)
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(df, "tok")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ordered"))
      .select(col("id"),
        transform(col("ordered"), x => x.getField("tok")).as("toks"),
        size(col("ordered")).as("sz"))
  }

  /** One row per (id, prefix gram hash). */
  private def prefixPostings(sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val prefixLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    sets.select(col("id"), explode(slice(col("toks"), lit(1), prefixLen)).as("ptok"))
  }

  /** WEIGHTED prefix join: exact all-pairs tf-idf COSINE ≥ t over unigram
    * terms, uncapped — the scale path that retires the q145 `doc_id <
    * 1000` slice. Same output contract as q145 (id_a < id_b, cosine
    * rounded to 4 before the threshold) on the full corpus.
    *
    * The weighted pruning argument (AllPairs/PPJoin lifted to unit
    * vectors): unit-normalize each document's tf-idf weights, order every
    * document's terms by a GLOBAL total order (ascending df, term-hash
    * tie-break — rarest, i.e. heaviest, first), and let tail_j =
    * ‖w[j..]‖₂ be the L2 norm of the suffix starting at term j. A
    * document's PREFIX is the terms with tail_j ≥ t. For any pair with
    * cos ≥ t, its first shared term (in the global order) must sit in
    * BOTH prefixes: were it past either prefix, every shared term would
    * be in that side's suffix and Cauchy-Schwarz caps the dot product at
    * ‖suffix‖₂·‖unit vector‖₂ < t. So prefix×prefix candidate generation
    * is LOSSLESS (asserted against brute force in spec), and because
    * rare-first ordering front-loads the heaviest weights, the tail
    * collapses fastest exactly when tf-idf is skewed — short prefixes of
    * RARE terms, so the posting-list fan-out Σ df² dies where the full
    * inverted index (q145's term self-join) explodes.
    *
    * The PPJoin position filter survives the lift: a candidate generated
    * at positions (p_a, p_b) bounds cos ≤ tail_{p_a}(a)·tail_{p_b}(b),
    * so posting pairs below t (minus a float-slack ε — pruning must
    * never decide membership) are dropped before the pair dedup; the
    * first-shared-term row always passes, preserving losslessness. The
    * length filter degenerates: unit vectors all have ‖·‖ = 1.
    *
    * Plan shape: one scan → term explode; one shuffle for df; one
    * shuffle on id for the per-doc window (tail norms) — STAGED once,
    * feeding postings and the verify vectors; the vectors groupBy reuses
    * the id partitioning (no new exchange); candidates shuffle on the
    * rare prefix term only, and while the vector table broadcasts the
    * raw pair stream is verified map-side WITHOUT a prior dedup (the
    * only shuffle it ever sees is the output-sized final dedup) — no
    * pair×term shuffle, unlike q145's groupBy(id_a, id_b) dot assembly.
    * Zero-norm documents (every term in every doc) are excluded — their
    * cosine is undefined.
    */
  def weightedCosinePrefixJoin(docs: DataFrame, idCol: String, textCol: String,
                               threshold: Double,
                               idfDocsOverride: Option[Double] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    NativeTextExpressions.register(docs.sparkSession)
    val nDocs = docs.count().toDouble
    // idfDocsOverride: weight terms as if the corpus had this many docs —
    // the per-partition-block exact decomposition (disjoint-vocabulary
    // shards: per-term df is shard-local already, only the idf numerator
    // is global) passes the FULL corpus size so every block scores with
    // the exact global tf-idf weights. The brute-vs-index physical gate
    // below still keys on the ACTUAL input size.
    val idfN = idfDocsOverride.getOrElse(nDocs)
    // Physical-strategy choice, same shape as Spark's broadcast-join
    // decision: below `spark.graft.prefixJoin.bruteMaxDocs` (default
    // 20 000) the unit-vector table broadcasts and the all-pairs
    // nested-loop verify (codegen'd sorted_dot; n²/2 merge-dots) costs
    // less than the index's extra shuffles — on a NEAR-DUP-DENSE corpus
    // the prefix index degenerates anyway (measured at sf0.1: 11.4M
    // candidates of 12.5M possible pairs, i.e. 9% pruning, with the
    // posting self-join + pair dedup + verify joins costing ~15 s where
    // the brute nested loop costs 1.2 s). Above the gate the lossless
    // prefix index is the only distributed-safe plan: candidates stay
    // ≤ all-pairs, nothing broadcasts, and pruning pays off exactly on
    // the sparse corpora where exact pair joins are runnable at all.
    val bruteMax = bruteMaxDocs(docs)
    val unit = unitTfidfTerms(docs, idCol, textCol, idfN)
    if (nDocs <= bruteMax) {
      // Dense/small regime: stage the sorted sparse vectors once, then
      // an inner broadcast nested-loop join over id_a < id_b with the
      // cosine computed IN the join projection — arrays never shuffle,
      // no posting join, no pair dedup. The staged read-back is one
      // tiny file (one partition), so the stream side is explicitly
      // repartitioned or the n²/2 merge-dots run on a single core.
      val vecs = Dedup.stage(
        unit.groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("tok"), col("u")))).as("kv"))
          .select(col("id"),
            transform(col("kv"), x => x.getField("tok")).as("ks"),
            transform(col("kv"), x => x.getField("u")).as("vs")),
        "wprefixjoin-brutevecs")
      val fanout = graft.GraftConf.explosiveFanout(docs.sparkSession)
      val blockRows = bruteBlockRows(docs)
      if (blockRows > 0) {
        // r19 blocked verify (guide §1.2 step 2): same recipe as the
        // jaccard branch — pack, broadcast, one fused kernel call per
        // block pair. The kernel emits RAW dots above threshold − 1e-4
        // (pruning only: round-to-4 moves a value by ≤ 5e-5) and the
        // SAME relational round+filter as the NLJ form decides
        // membership, so the output rows are bit-identical (spec-pinned).
        val blocks = withBlockId(vecs, nDocs.toLong, blockRows)
          .groupBy(col("bid"))
          .agg(expr("pack_sparse_vec_block(collect_list(struct(id, ks, vs)))").as("blob"))
        return blocks.repartition(fanout).as("a")
          .join(broadcast(blocks).as("b"), col("a.bid") <= col("b.bid"))
          .select(explode(expr(
            s"sorted_dot_block_pairs(a.blob, b.blob, ${threshold - 1e-4}, a.bid = b.bid)")).as("e"))
          .select(col("e.id_a").as("id_a"), col("e.id_b").as("id_b"),
            round(col("e.dot"), 4).as("cosine"))
          .filter(col("cosine") >= threshold)
      }
      return vecs.repartition(fanout)
        .select(col("id").as("id_a"), col("ks").as("ka"), col("vs").as("va"))
        .join(broadcast(vecs.select(col("id").as("id_b"), col("ks").as("kb"), col("vs").as("vb"))),
          col("id_a") < col("id_b"))
        .withColumn("cosine", round(expr("sorted_dot(ka, va, kb, vb)"), 4))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    }
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val tails = Dedup.stage(
      unit.withColumn("tail", sqrt(sum(col("u") * col("u")).over(byRarity))),
      "wprefixjoin-tails")
    val posting = tails.filter(col("tail") >= threshold)
      .select(col("id"), col("tok"), col("tail"))
    // one raw row per SHARED PREFIX TERM of a pair (position-filtered in
    // the join condition) — deliberately NOT deduped here; see below.
    // PARALLELISM, not volume, is the trap on this join: the posting
    // table is tiny (9 rows/doc — ~11 MB at 50k docs) but its self-join
    // output is O(Σ df²) — AQE sees only the input bytes, so it either
    // coalesces the exchange or scans the staged file in one task and
    // the 10⁸-row explosion runs on 1–2 cores. While the posting table
    // fits a broadcast, pin the physical shape ourselves: explicit
    // round-robin fan-out of the stream side (user repartitions are
    // exempt from AQE coalescing) against a broadcast build side. Past
    // the broadcast gate the join must shuffle — but the pin is still
    // required there (measured at 250k docs, see the branch below).
    // Fan out BY ID, not round-robin: every duplicate of a pair (a, b)
    // is generated from one of a's posting rows, so hash-partitioning
    // the stream side on id co-locates them — the final dedup's partial
    // aggregation then collapses duplicates map-side and only
    // output-sized distinct pairs ever reach its exchange (measured at
    // t=0.7/50k docs: 254M verified rows, 33M distinct).
    val fanout = graft.GraftConf.explosiveFanout(docs.sparkSession)
    // Byte-based broadcast gate (shared by the posting join and the
    // verify below): the broadcast payloads are variable-width — the
    // verify vectors carry one (long, double) entry per distinct term
    // per doc — so gate on measured volume, not document count. `tails`
    // is staged parquet, so the count is metadata-cheap; the posting
    // table is a tail-filtered subset of the same rows.
    val nTerms = tails.count()
    val fitsBroadcast = nTerms * 16L + nDocs.toLong * 32L <=
      graft.GraftConf.broadcastBytes(docs.sparkSession)
    logger.info(s"weightedCosinePrefixJoin verify: " +
      s"${if (fitsBroadcast) "BROADCAST" else "SHUFFLE"} regime " +
      s"(vector table ~${nTerms * 16L + nDocs.toLong * 32L} B vs gate " +
      s"${graft.GraftConf.broadcastBytes(docs.sparkSession)} B, $nDocs docs)")
    val rawPairs = (
      if (fitsBroadcast)
        posting.repartition(fanout, col("id")).as("a").join(broadcast(posting).as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            col("a.tail") * col("b.tail") >= threshold - 1e-9)
      else
        // Shuffle regime: the pin is STILL required. The r12 assumption
        // ("past the gate the posting table carries real bytes and AQE
        // sizes the exchange correctly") was MEASURED FALSE at 250k
        // docs: the posting input is ~35 MB — AQE coalesced the join
        // exchange to 1–2 partitions and the ~10⁹-row explosion ran on
        // 3/32 cores (killed after 12 min; pinned it completes in
        // ~2 min). Repartition BOTH sides on the join key with the
        // pinned fan-out: co-partitioned (no extra exchange for the
        // join) and exempt from AQE coalescing. Per-token skew is
        // bounded by the prefix filter (tail ≥ t keeps only each doc's
        // rarest terms, so df_prefix per token stays small by design).
        posting.repartition(fanout, col("tok")).as("a")
          .join(posting.repartition(fanout, col("tok")).as("b"),
            col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
              col("a.tail") * col("b.tail") >= threshold - 1e-9)
      ).select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // verify vectors as (sorted key array, aligned value array): the
    // native merge-join dot is O(|a|+|b|) per pair where a map column is
    // O(|a|·|b|) (Catalyst map lookup is a linear scan) — at 10⁷
    // candidates on a dense corpus that is the difference between the
    // verify dominating the join and disappearing into it
    val vecs = Dedup.stage(
      tails.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("tok"), col("u")))).as("kv"))
        .select(col("id"),
          transform(col("kv"), x => x.getField("tok")).as("ks"),
          transform(col("kv"), x => x.getField("u")).as("vs")),
      "wprefixjoin-vecs")
    if (fitsBroadcast) {
      // VERIFY-THEN-DEDUP: while the vector table fits an executor, the
      // whole verify is map-side (two broadcast hash joins + the
      // codegen'd merge-dot), so a duplicated candidate costs one extra
      // in-pipeline dot — ~5.8 raw rows/pair measured on the
      // template-dense 50k-doc corpus — while deduping FIRST costs a
      // full shuffle + hash-agg of the raw pair stream (717M rows,
      // 132 of 250 s at that scale). Only qualifying pairs (output-
      // sized, every duplicate row bit-identical since the dot depends
      // only on the pair) reach the final dedup exchange.
      rawPairs
        .join(broadcast(vecs.select(col("id").as("id_a"), col("ks").as("ka"), col("vs").as("va"))), "id_a")
        .join(broadcast(vecs.select(col("id").as("id_b"), col("ks").as("kb"), col("vs").as("vb"))), "id_b")
        .withColumn("cosine", round(expr("sorted_dot(ka, va, kb, vb)"), 4))
        .filter(col("cosine") >= threshold)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), col("cosine"))
    } else {
      // Past the broadcast cutoff the verify joins shuffle the candidate
      // rows anyway, so duplicates would ride (and pay for) every
      // exchange twice — dedup first, then shuffle-join the vectors.
      // Two plan pins, both measured fatal without them at the 250k-doc
      // shape: (1) the dedup exchange is repartitioned to the fan-out
      // width — at spark.sql.shuffle.partitions=32 each aggregate task
      // got ~10⁸ raw rows, the hash map fell back to sort-based
      // aggregation and spilled the entire raw stream; (2) the vector
      // joins are hinted SHUFFLE_HASH — sort-merge joins SORT the
      // candidate stream, and on the id_b join the stream already
      // carries the id_a-side (ks, vs) arrays (~2.4 KB/row), so the
      // sort spill is candidates × vector-bytes. With hash joins the
      // small vector table is the build side and the fat stream is
      // never sorted; the one unavoidable cost above the gate is the
      // id_b exchange carrying the attached arrays — linear in
      // candidates and spread across the cluster, vs. quadratic sort
      // spill on whichever task sorts.
      rawPairs.repartition(fanout, col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .join(vecs.select(col("id").as("id_a"), col("ks").as("ka"), col("vs").as("va"))
          .hint("shuffle_hash"), "id_a")
        .join(vecs.select(col("id").as("id_b"), col("ks").as("kb"), col("vs").as("vb"))
          .hint("shuffle_hash"), "id_b")
        .withColumn("cosine", round(expr("sorted_dot(ka, va, kb, vb)"), 4))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    }
  }

  /** (id, tok, df, u): each document's L2-unit tf-idf weights over
    * whitespace unigram terms (terms XXH64-hashed, idf = ln(N/df)) —
    * the shared vector model of the weighted prefix join and the
    * hashed-embedding ANN swap. Zero-norm documents are excluded
    * (their cosine is undefined).
    */
  private[graft] def unitTfidfTerms(docs: DataFrame, idCol: String,
                                        textCol: String, nDocs: Double): DataFrame = {
    // r18 (guide §2.3 "aggregate before you shuffle"): term frequency is
    // a PER-DOCUMENT quantity, but the explode → groupBy(id, term) form
    // shuffled one row per term OCCURRENCE to compute it. The native
    // `word_tf_entries` builds each document's (tok, tf) pairs in the
    // scan (same lower(), same regex-\s tokenization, same xxhash64 seed
    // — bit-identical rows, spec-pinned), so the tf exchange disappears
    // and only the df aggregate, the df join, and the norm aggregate
    // shuffle — each over (doc, term)-distinct rows, never occurrences.
    NativeTextExpressions.register(docs.sparkSession)
    val tf = docs
      .select(col(idCol).as("id"),
        explode_outer(expr(s"word_tf_entries($textCol)")).as("e"))
      .filter(col("e").isNotNull)
      .select(col("id"), col("e.tok").as("tok"), col("e.tf").as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = tf.join(dfT, "tok")
      .select(col("id"), col("tok"), col("df"),
        (col("tf") * log(lit(nDocs) / col("df"))).as("w"))
    val norms = w.groupBy(col("id")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    w.join(norms, "id").filter(col("nrm") > 0)
      .select(col("id"), col("tok"), col("df"), (col("w") / col("nrm")).as("u"))
  }

  /** Public form of [[unitTfidfTerms]]: the (id, tok, df, u) unit
    * tf-idf table for `docs`. Callers that derive several artifacts
    * from it (sparse vectors AND hashed embeddings) should stage the
    * result once — Spark does no CSE across DataFrame references.
    */
  def unitTfidfTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    NativeTextExpressions.register(docs.sparkSession)
    unitTfidfTerms(docs, idCol, textCol, docs.count().toDouble)
  }

  /** (id, ks, vs) sorted sparse vectors from a [[unitTfidfTable]] —
    * the `sorted_dot` input format the exact verify paths use.
    */
  def sortedVectorsFromUnit(unit: DataFrame): DataFrame =
    unit.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("u")))).as("kv"))
      .select(col("id"),
        transform(col("kv"), x => x.getField("tok")).as("ks"),
        transform(col("kv"), x => x.getField("u")).as("vs"))

  /** Feature-hashed dense embeddings of the tf-idf unit vectors —
    * the bridge from the exact sparse pair joins to the ANN family
    * ([[Similarity.ivfTopK]] etc.), which needs fixed-dimension
    * `array<float>` input. Signed hashing kernel (Weinberger et al.,
    * "Feature Hashing for Large Scale Multitask Learning"): slot =
    * tok mod dim, sign = one independent hash bit, so collisions
    * cancel in expectation and E[⟨φ(a), φ(b)⟩] = ⟨a, b⟩ — hashed
    * cosine is an unbiased estimate of the exact tf-idf cosine, with
    * variance shrinking in `dim`. Everything is scan-local after the
    * per-doc agg: slot sums groupBy (id, slot), the dense array
    * assembles from a slot→value map per document.
    */
  def hashedTfidfEmbeddings(docs: DataFrame, idCol: String, textCol: String,
                            dim: Int = 256): DataFrame =
    hashedEmbeddingsFromUnit(unitTfidfTable(docs, idCol, textCol), dim)

  /** One aggregation producing BOTH vector artifacts of a document —
    * (id, ks, vs, embedding): the sorted sparse tf-idf vector (the
    * `sorted_dot` exact-rerank format) and its feature-hashed dense
    * embedding (the ANN index/query format). A pipeline that needs both
    * (q204: IVF shortlist + exact rerank) previously ran three
    * aggregations over the unit table and staged two tables; here the
    * single per-doc collect feeds the dense assembly scan-locally — the
    * signed entries go to `sparse_to_dense` un-pre-summed, which is why
    * that kernel accumulates on repeated slots. Column pruning keeps
    * consumers honest: a reader of `embedding` never pays for ks/vs in
    * the staged parquet and vice versa.
    */
  def vectorTableFromUnit(unit: DataFrame, dim: Int = 256): DataFrame = {
    require(dim >= 2, s"embedding dim must be >= 2, got $dim")
    graft.functions.VectorFunctions.register(unit.sparkSession)
    unit.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("u")))).as("kv"))
      .select(col("id"),
        transform(col("kv"), x => x.getField("tok")).as("ks"),
        transform(col("kv"), x => x.getField("u")).as("vs"),
        expr(s"""sparse_to_dense(
             |  transform(kv, x -> struct(
             |    cast(pmod(x.tok, $dim) as int) as slot,
             |    case when pmod(shiftrightunsigned(x.tok, 32), 2) = 0
             |         then x.u else -x.u end as v)),
             |  $dim)""".stripMargin).as("embedding"))
  }

  /** [[hashedTfidfEmbeddings]] over an existing (possibly staged)
    * [[unitTfidfTable]]. The dense assembly is the native
    * `sparse_to_dense` (one pass per document) — the declarative
    * map-lookup formulation paid O(dim × entries) interpreted HOF work
    * per document and dominated the embedding build.
    */
  def hashedEmbeddingsFromUnit(unit: DataFrame, dim: Int = 256): DataFrame = {
    require(dim >= 2, s"embedding dim must be >= 2, got $dim")
    graft.functions.VectorFunctions.register(unit.sparkSession)
    val slotted = unit
      .select(col("id"), pmod(col("tok"), lit(dim)).cast("int").as("slot"),
        // an independent bit of the 64-bit hash decides the sign; tok
        // mod dim uses the LOW bits, so take the sign bit from the top
        when(shiftrightunsigned(col("tok"), 32) % 2 === 0, col("u"))
          .otherwise(-col("u")).as("sv"))
      .groupBy(col("id"), col("slot")).agg(sum(col("sv")).as("v"))
    slotted.groupBy(col("id"))
      .agg(collect_list(struct(col("slot"), col("v"))).as("entries"))
      .select(col("id").as("vec_id"),
        expr(s"sparse_to_dense(entries, $dim)").as("embedding"))
  }
}
