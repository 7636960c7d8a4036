package graft

import org.apache.spark.sql.SparkSession

/** Validated accessors for the `spark.graft.*` tuning confs.
  *
  * Every knob the engine reads at plan-build time lives here so (a) a
  * typo'd value fails with a message NAMING the conf key, not a bare
  * NumberFormatException from deep inside the planner, and (b) the full
  * key inventory is greppable in one place (the README table is generated
  * from this list).
  */
object GraftConf {

  /** Int conf with a validating parse. */
  def int(spark: SparkSession, key: String, default: => Int): Int =
    spark.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be an integer, got '$raw'"))
    }.getOrElse(default)

  /** Long conf with a validating parse. */
  def long(spark: SparkSession, key: String, default: => Long): Long =
    spark.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be a long, got '$raw'"))
    }.getOrElse(default)

  /** Boolean conf with a strict parse (only literal true|false; the
    * same no-silent-fallthrough posture as the mode-string confs). */
  def bool(spark: SparkSession, key: String, default: => Boolean): Boolean =
    spark.conf.getOption(key).map { raw =>
      raw.trim.toLowerCase match {
        case "true"  => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"conf $key must be true|false, got '$other'")
      }
    }.getOrElse(default)

  /** Double conf with a validating parse. */
  def double(spark: SparkSession, key: String, default: => Double): Double =
    spark.conf.getOption(key).map { raw =>
      scala.util.Try(raw.trim.toDouble).getOrElse(
        throw new IllegalArgumentException(
          s"conf $key must be a number, got '$raw'"))
    }.getOrElse(default)

  /** Partition count for the fan-out repartition that pins parallelism on
    * explosive self-joins (KB-scale inputs, quadratic output — AQE sizes
    * their exchanges by input bytes and coalesces the real work onto 1–2
    * tasks; the sf1 measurement was 237–258 s single-threaded vs ~20 s
    * pinned).
    *
    * `spark.graft.explosiveJoin.fanout` overrides the default
    * `4 × defaultParallelism`. The default is read at PLAN-BUILD time; on
    * a dynamic-allocation cluster that can be stale (plan built before
    * executors arrive), so set the conf explicitly to the intended
    * steady-state core count there.
    */
  def explosiveFanout(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.explosiveJoin.fanout",
      4 * spark.sparkContext.defaultParallelism)
    require(v > 0, s"spark.graft.explosiveJoin.fanout must be positive, got $v")
    v
  }

  /** Row budget below which an LSH band table (minhash/simhash/SRP
    * (table, bucket) rows — fixed-width, one row per doc per band) is
    * broadcast as the build side of its candidate self-join. Above it the
    * join shuffles — with BOTH sides explicitly repartitioned on the join
    * keys, because AQE still cannot see the quadratic output (measured at
    * 250k docs on the prefix join: 3/32 cores busy unpinned). Row-gating
    * is sound here, unlike the verify-side tables, because band rows are
    * fixed-width (two longs); 2M rows ≈ tens of MB.
    * `spark.graft.bandJoin.broadcastRows` overrides (0 forces the shuffle
    * regime — used by plan-shape specs and scale measurements).
    */
  def bandBroadcastRows(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.bandJoin.broadcastRows", 2000000L)
    require(v >= 0, s"spark.graft.bandJoin.broadcastRows must be >= 0, got $v")
    v
  }

  /** Byte budget below which a variable-width side table (shingle-hash
    * arrays, posting lists, packed vectors) is broadcast into the verify
    * join. Row-count gates are wrong for fat-array payloads: 100k docs of
    * long-document shingle arrays can be GBs.
    *
    * The default scales with the JVM: `max(64 MiB, min(1 GiB, maxHeap/16))`.
    * A fixed 64 MiB proved far too timid — the alternative to the
    * broadcast is an exchange carrying the CANDIDATE STREAM with vector
    * arrays attached (candidates × vector-bytes: measured at the 250k-doc
    * shape, ~150 M pairs × ~2.4 KB ≈ 360 GB through one exchange, where
    * the broadcast was 600 MB — a 600× byte trade). A GiB-scale broadcast
    * is the cheap side of that trade on any executor with ≥16 GiB. The
    * default reads the SMALLER of the driver heap and the configured
    * executor heap (`spark.executor.memory`, when set): the broadcast
    * build is materialized on executors, so a driver-only proxy would
    * push GiB-scale broadcasts into small executors on clusters where
    * executors < driver/16. The derived default is logged once per key
    * per session so a heap-dependent regime flip is greppable, exactly
    * like the IVF orientation log; set the conf explicitly to pin the
    * plan shape across environments.
    */
  def broadcastBytes(spark: SparkSession): Long = {
    val v = spark.conf.getOption("spark.graft.broadcastBytes") match {
      case Some(raw) =>
        scala.util.Try(raw.trim.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"conf spark.graft.broadcastBytes must be a long, got '$raw'"))
      case None =>
        val driverHeap = Runtime.getRuntime.maxMemory
        // executor heap if configured ("4g" strings) — min with the driver
        // heap so neither side of the exchange-vs-broadcast trade can be
        // sized off the larger JVM. local mode has no executor conf; the
        // driver heap IS the executor heap there.
        val execHeap = spark.conf.getOption("spark.executor.memory")
          .flatMap(parseExecutorMemoryBytes)
          .getOrElse(driverHeap)
        val derived =
          math.max(64L << 20, math.min(1L << 30, math.min(driverHeap, execHeap) / 16))
        logDerivedOnce(spark, "spark.graft.broadcastBytes",
          s"$derived B (min(driverHeap=$driverHeap, executorHeap=$execHeap)/16," +
            " clamped [64 MiB, 1 GiB])")
        derived
    }
    require(v > 0, s"spark.graft.broadcastBytes must be positive, got $v")
    v
  }

  /** `spark.executor.memory` as bytes, with MiB as the suffixless unit —
    * Spark itself reads this conf through `byteStringAsMb`, so "4096"
    * means 4096 MiB. `byteStringAsBytes` would read it as 4096 BYTES, a
    * 2²⁰× underestimate that silently collapses the derived
    * [[broadcastBytes]] default to its 64 MiB floor — the exact
    * too-timid regime the derived default exists to avoid.
    */
  private[graft] def parseExecutorMemoryBytes(m: String): Option[Long] =
    scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsMb(m) << 20).toOption

  /** Estimated raw band-collision count above which
    * [[graft.operators.Similarity.cosineNearDupPairs]] abandons SRP
    * banding for the IVF-shortlist route. At loose thresholds SRP banding
    * is near-exhaustive BY CONSTRUCTION: the table auto-tuner hits its
    * cap and expected within-bucket collisions grow ~N² (measured at the
    * sf5 shape: 5.0 B raw collisions, 86.3 s, 18.5× on 5× rows — the
    * wall-clock tracks candidate volume even though the plan is sound).
    * The estimate is an exact Σ C(bucket,2) aggregate over the banded
    * table (one linear job, the same signal the r13 audit used). The
    * default keeps the measured sf1 shape (~300 M collisions) on the
    * banded path and routes the sf5 shape (5.0 B). `0` forces the IVF
    * route (specs, scale runs); `Long.MaxValue` pins banding.
    */
  def srpRouteCandidates(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.srp.routeCandidates", 1000000000L)
    require(v >= 0, s"spark.graft.srp.routeCandidates must be >= 0, got $v")
    v
  }

  /** Corpus-byte budget under which [[graft.operators.Similarity.ivfSearch]]
    * REPLICATES the decoded packed index to every executor (one torrent
    * broadcast of primitive arrays) and probes entirely map-side: no
    * probe-stream exchange (the per-(list, salt) query pack moved
    * ~nprobe × queryBytes — 73 GB at the 1M-doc corpus-as-queries shape)
    * and no global top-k window shuffle (each query's final top-k is
    * computed where its row already sits). This is the standard
    * replicated-small-index ANN tier; past the budget the existing
    * per-query / cross-block orientations remain the distributed path.
    * Defaults to [[broadcastBytes]] (the same executor-heap-derived
    * budget — the decoded arrays live on every executor). `0` disables.
    */
  def annReplicateIndexBytes(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.ann.replicateIndexBytes", broadcastBytes(spark))
    require(v >= 0, s"spark.graft.ann.replicateIndexBytes must be >= 0, got $v")
    v
  }

  /** Scoring regime of the REPLICATED probe orientation
    * (`spark.graft.ann.probeInt8` = true | false | auto, default AUTO):
    * whether the broadcast index copy is int8-quantized (the
    * scalar-quantizer scan: 4× smaller resident index, 16-lane integer
    * SIMD dot). Cosine is per-vector scale-invariant, so each vector
    * quantizes independently (`quantize_i8` math exactly). The quantized
    * scan selects a SHORTLIST only (`rerankFactor`·k per query, floor
    * relaxed by the quantization margin); the emitted scores and the
    * `minCosine` filter are EXACT — an in-operator float rerank of the
    * shortlist, same recipe as the PQ routes. Approximation therefore
    * lives only in shortlist membership (recall spec-gated ≥ its float
    * twin's gate).
    *
    *   - `auto` (default): replicate the float copy while it fits the
    *     resident budget (bench/driver plans unchanged — bit-identical
    *     float path); when only the int8 copy fits, replicate quantized
    *     instead of falling to the distributed orientations (measured
    *     3.2× faster at equal recall, sf20 AND sf40).
    *   - `true`: always score the replicated probe quantized (the A/B
    *     knob the scale measurements use).
    *   - `false`: never quantize — float-or-distributed only.
    */
  def annProbeInt8Mode(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.ann.probeInt8") match {
      case None => "auto"
      case Some(raw) => raw.trim.toLowerCase match {
        case m @ ("true" | "false" | "auto") => m
        case other => throw new IllegalArgumentException(
          s"conf spark.graft.ann.probeInt8 must be true|false|auto, got '$other'")
      }
    }

  /** Score the REPLICATED probe orientation against PQ codes + codebook
    * LUTs (`spark.graft.ann.probePq`, default false): the resident copy
    * shrinks to `pqM` bytes/vector + a driver-small shared codebook —
    * 2–4× under the int8 copy, 8–16× under float at dim 64 — and scoring
    * a candidate is m table lookups instead of dim multiplies. Shortlist
    * + exact rerank exactly like the int8 regime (emitted scores exact);
    * ADC error exceeds int8 error, so shortlist recall is the honest
    * cost — measure it before turning this on for a threshold consumer.
    * Opt-in (wins over the int8 regime when set).
    */
  def annProbePq(spark: SparkSession): Boolean =
    bool(spark, "spark.graft.ann.probePq", default = false)

  /** Per-search generic-id corpus audit
    * (`spark.graft.ann.auditGenericIdsPerSearch`, default false): the
    * corpus-side surrogate-collision audit (countDistinct(surrogate) ==
    * countDistinct(orig) over the whole corpus) normally runs ONCE per
    * index lifetime — memoized on the index instance, stamped into saved
    * artifacts, re-armed by appends. `true` restores the every-search
    * full-corpus scan (paranoia mode for corpora mutated outside the
    * graft API, where the memo could go stale). The query-side audit is
    * batch-sized and always runs.
    */
  def annAuditGenericIdsPerSearch(spark: SparkSession): Boolean =
    bool(spark, "spark.graft.ann.auditGenericIdsPerSearch", default = false)

  /** Disk-lazy in-kernel exact rerank of the int8 replicated probe
    * (`spark.graft.ann.rerankDiskLazy`, default FALSE — measured
    * negative): when the loaded artifact carries a blob sidecar, the
    * probe kernel rescores its own shortlist by positioned-reading the
    * winners' packed float blobs through a per-executor LRU — no
    * shortlist exchange at all, vs the join-form rerank's
    * corpus_vec-per-shortlist-row shuffle. Measured at the adversarial
    * sf20 1M-queries-=-corpus shape it LOST ≥10× to the join-form
    * (kernel-stage tasks 676–1050 s, projected stage ≈ 3500 s vs the
    * join-form's 330.9 s total): per-winner LRU round-trips through one
    * global lock, with unsorted queries collapsing the hit rate against
    * a corpus 4× the cache budget (PLANS.md round-18). Results are
    * bit-equal either way (spec-pinned); opt in only for bounded query
    * batches against big corpora, where the fetched blob set is small.
    * Named next levers before the default can flip: query-locality sort
    * (repartition queries by primary probe list) + per-query ordinal
    * batching + striped locks.
    */
  def annRerankDiskLazy(spark: SparkSession): Boolean =
    bool(spark, "spark.graft.ann.rerankDiskLazy", default = false)

  /** Per-executor decoded-blob LRU budget of the disk-lazy rerank
    * (`spark.graft.ann.blobCacheBytes`, default 256 MiB): bounds the
    * float blocks resident for rescoring; blobs past the budget are
    * re-read (page cache makes the re-read cheap on a warm host).
    */
  def annBlobCacheBytes(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.ann.blobCacheBytes", 268435456L)
    require(v > 0, s"spark.graft.ann.blobCacheBytes must be > 0, got $v")
    v
  }

  /** What the quantized/PQ replicated probe EMITS
    * (`spark.graft.ann.probeRerank` = exact | off, default exact):
    *
    *   - `exact`: the approximate scan only selects a shortlist
    *     (`rerankFactor`·k, floor relaxed by the quantization margin);
    *     an in-operator float rerank re-scores it, so emitted cosines
    *     and the `minCosine` filter are exact. Costs one corpus-join
    *     pass over the shortlist (~rerankFactor·k rows/query).
    *   - `off`: emit the approximate scores directly (int8: ~1e-2 error;
    *     ADC: coarser) with `minCosine` applied to the APPROXIMATE
    *     score — the right mode when the caller reranks exactly
    *     downstream anyway (the q204 composition), where the in-operator
    *     rerank would be a redundant second pass.
    *
    * Callers that provably rerank downstream pass the decision in code
    * (`ivfSearch(quantizedRerank = Some(false))`), which wins over this
    * conf.
    */
  def annProbeRerank(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.ann.probeRerank") match {
      case None => "exact"
      case Some(raw) => raw.trim.toLowerCase match {
        case m @ ("exact" | "off") => m
        case other => throw new IllegalArgumentException(
          s"conf spark.graft.ann.probeRerank must be exact|off, got '$other'")
      }
    }

  /** Shortlist overfetch of the quantized/PQ replicated probe: the
    * approximate scan keeps `rerankFactor`·k candidates per query for the
    * exact rerank (the same knob the PQ search routes default to 4).
    */
  def annRerankFactor(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.ann.rerankFactor", 4)
    require(v >= 1, s"spark.graft.ann.rerankFactor must be >= 1, got $v")
    v
  }

  /** Floor relaxation of the PQ/ADC shortlist scan
    * (`spark.graft.ann.pqFloorMargin`, default 0.10): a candidate whose
    * TRUE cosine clears `minCosine` may score up to this much lower under
    * ADC reconstruction, so the quantized scan keeps everything above
    * `floor − margin` and the exact rerank re-applies the exact floor.
    * Unlike the int8 margin (a measured global bound — scalar-quantizer
    * error stays well under 0.02 on unit-ish vectors), ADC error is
    * DATASET-dependent: codebook quality sets it, and sparse/hashed
    * vectors reconstruct far worse than dense ones (the measured PQ
    * rejection on the tf-idf corpus). The default is pinned against the
    * observed max ADC error on the dense test fixture (QuantizedProbeSpec
    * measures it the way the int8 off-mode test pins Int8FloorMargin);
    * a corpus with coarser reconstruction must widen it from its own
    * off-mode measurement before trusting a PQ shortlist under a floor.
    */
  def annPqFloorMargin(spark: SparkSession): Double = {
    val v = double(spark, "spark.graft.ann.pqFloorMargin",
      graft.operators.Similarity.PqFloorMargin)
    require(v >= 0, s"spark.graft.ann.pqFloorMargin must be >= 0, got $v")
    v
  }

  /** Subquantizer count for the replicated PQ probe copy (dim must
    * divide by it). 8 at dim 64 → 8-float subspaces, 8 bytes/vector.
    */
  def annPqM(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.ann.pqM", 8)
    require(v >= 1, s"spark.graft.ann.pqM must be >= 1, got $v")
    v
  }

  /** Codebook size per subspace for the replicated PQ probe copy (byte
    * codes: at most 256).
    */
  def annPqKsub(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.ann.pqKsub", 256)
    require(v >= 2 && v <= 256,
      s"spark.graft.ann.pqKsub must be in [2, 256], got $v")
    v
  }

  /** Per-node neighbor budget for the routed
    * [[graft.operators.Similarity.cosineNearDupPairs]]: the IVF route
    * emits the symmetric top-`routeK` neighbor EDGES above the threshold
    * (a k-NN graph), not the exhaustive pair set — the contract the
    * recall gate measures. Raise when the corpus has above-threshold
    * degrees routinely exceeding the budget.
    */
  def srpRouteK(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.srp.routeK", 64)
    require(v > 0, s"spark.graft.srp.routeK must be positive, got $v")
    v
  }

  /** Profile row cap under which BPE merge training collects the
    * (vocabulary-sized) word profile and runs the merge loop driver-
    * locally — zero per-merge Spark jobs, bit-identical merge sequence
    * (spec-pinned). The distributed per-merge loop remains the fallback
    * above it. ~10⁶ words × tens of bytes is MBs of driver heap; the cap
    * guards the pathological all-unique-words profile.
    */
  def bpeLocalVocabRows(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.bpe.localVocabRows", 2000000L)
    require(v >= 0, s"spark.graft.bpe.localVocabRows must be >= 0, got $v")
    v
  }

  /** Per-cell array-byte budget of the grid (fragment-and-replicate)
    * verify ([[graft.operators.Dedup.gridJaccardVerify]]): the fragment
    * count P is the smallest whose per-cell array volume
    * (2·corpusArrayBytes/P) fits this budget, so per-task memory is
    * bounded regardless of corpus size while total replicated array
    * traffic stays 2P·corpusBytes. Hash collisions can co-locate a few
    * cells per task — budget ~3× headroom under the per-core heap.
    */
  def gridVerifyCellBytes(spark: SparkSession): Long = {
    val v = long(spark, "spark.graft.gridVerify.cellBytes", 128L << 20)
    require(v > 0, s"spark.graft.gridVerify.cellBytes must be positive, got $v")
    v
  }

  /** Multiplier on the grid-vs-join crossover of the shuffle-regime
    * minhash verify. Past the broadcast gate the verify picks between two
    * shapes by measured cost: the JOIN-form (shuffle-hash, sort-free)
    * moves each doc's shingle array once per candidate referencing it
    * (avg pair-degree), while the grid co-group moves it 2P times
    * regardless of the candidate distribution. The grid is chosen iff
    * `est pair degree ≥ 2P · degreeFactor`. 0 forces the grid; a huge
    * value forces the join-form (both used by the plan-shape specs).
    */
  def gridVerifyDegreeFactor(spark: SparkSession): Double = {
    val v = double(spark, "spark.graft.gridVerify.degreeFactor", 1.0)
    require(v >= 0, s"spark.graft.gridVerify.degreeFactor must be >= 0, got $v")
    v
  }

  /** Upper bound on the grid verify's fragment count P. P grows linearly
    * with corpus array bytes (2·setBytes / cellBytes), so uncapped it
    * requests P² cells — ~1 TB of arrays at the 128 MiB default cell is
    * P≈16k ⇒ ~270 M shuffle partitions, and the Int cell product
    * overflows negative past P = 46341. When the uncapped P exceeds this
    * bound [[graft.operators.Dedup.shuffleVerify]] falls back to the
    * join-form verify (logged): a grid forced under the cap would exceed
    * its per-cell byte budget, i.e. per-task memory would no longer be
    * bounded — the property the grid exists to provide. The default
    * (512 ⇒ ≤262,144 cells, covering ≤32 GiB of arrays at the default
    * cell budget) keeps the exchange width in the range any real
    * scheduler handles.
    */
  def gridVerifyMaxFragments(spark: SparkSession): Int = {
    val v = int(spark, "spark.graft.gridVerify.maxFragments", 512)
    require(v >= 2 && v <= 46340,
      s"spark.graft.gridVerify.maxFragments must be in [2, 46340] " +
        s"(P² must stay a positive Int), got $v")
    v
  }

  /** One log line per (session, key) for heap/environment-derived conf
    * defaults — a regime flip caused by a different JVM sizing must be
    * greppable without being a per-plan log storm.
    */
  private val loggedDerived =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def logDerivedOnce(spark: SparkSession, key: String, detail: String): Unit =
    if (loggedDerived.add(s"${spark.sparkContext.applicationId}/$key"))
      org.slf4j.LoggerFactory.getLogger(getClass)
        .info(s"derived default for $key: $detail")
}

/** Logs `graft.*`-named `Dataset.observe` metrics when their query
  * completes — the zero-extra-job channel for data-dependent plan
  * telemetry (e.g. the minhash verify screen's candidates/survivors
  * counts). Registered at most once per application.
  */
object ObservedMetrics {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensureLogger(spark: SparkSession): Unit =
    if (registered.add(spark.sparkContext.applicationId))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          private val log = org.slf4j.LoggerFactory.getLogger(getClass)
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val m = qe.observedMetrics.filter(_._1.startsWith("graft."))
            if (m.nonEmpty)
              log.info(m.map { case (k, r) => s"$k=$r" }
                .mkString("observed metrics: ", ", ", ""))
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
}
