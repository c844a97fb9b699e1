package graft

/** Regression tests for the SCALE-CRITICAL plan shapes (VERDICT r2 items
  * 3-6): the properties that make the similarity/dedup operators safe at
  * 100 TB are asserted on the optimized physical plan, so a refactor that
  * silently reintroduces a quadratic block or loses partition pruning
  * fails here — not at cluster scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("llm_cosine_neardup joins on LSH band buckets, never the label column") {
    val p = plan("llm_cosine_neardup")
    assert(p.contains("band_hash"), "candidate join must key on band hashes")
    // The label column must not appear anywhere: blocking on a
    // low-cardinality categorical is the quadratic scale-killer.
    assert(!p.contains("label"), "plan must not block on the categorical label")
    // The sign bits must come from the fused codegen expression, not an
    // interpreted HOF fold (the expensive non-codegen child that once
    // forced a MERGE hint to keep AQE from rebuilding it single-threaded
    // inside a broadcast build).
    assert(p.contains("hyperplane_bits"), "banding must use the native expression")
    assert(!p.contains("lambdafunction"),
      "no interpreted lambda may remain on the banding path")
  }

  test("llm_cosine_neardup verifies inline: ONE band self-join, no candidate-sized lookup joins") {
    val p = plan("llm_cosine_neardup")
    // The vector rides the band shuffle: exactly one join in the whole
    // plan (the band-bucket self-join whose output feeds cosine +
    // threshold directly). The former pairs-then-lookup shape carried
    // two more joins that re-shuffled the 100M-row candidate
    // intermediate against the embeddings table by va then vb — ~30 GB
    // of shuffle at sf30p that this plan must never reintroduce.
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(p).length
    assert(joins === 1, s"expected exactly 1 join (the band self-join), found $joins")
  }

  test("llm_semantic_dedup_inc reads persisted star state, never re-bands the lake") {
    val p = plan("llm_semantic_dedup_inc")
    // The row is assignment() over the on-disk star generation: a pure
    // scan + projection/union. Any hyperplane_bits or band join in the
    // plan means the lake's banding leaked back into the query path.
    assert(!p.contains("hyperplane_bits"),
      "the query path must not re-derive band hashes")
    assert(!p.contains("cos_sim"), "the query path must not re-verify pairs")
    assert(p.contains("vecdedupstate") || p.contains("stars"),
      "must scan the persisted star generation")
  }

  test("llm_ann_ivf cell scan is dynamic-partition-pruned") {
    val p = plan("llm_ann_ivf")
    assert(p.contains("dynamicpruning"),
      "corpus scan must carry a dynamic partition pruning filter")
  }

  test("llm_ngram_jaccard reads documents exactly once (exchange-reused self-join)") {
    // AQE hides its inner tree from plan.collect; disable it so the scan
    // count inspects the real physical operators.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("llm_ngram_jaccard")(spark, dir)
      val exec = df.queryExecution.executedPlan
      val scans = exec.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size === 1,
        s"jaccard must scan documents once; found ${scans.size} file scans " +
          "(the DF cutoff and set sizes must be window counts over the one " +
          "word stream, and the self-join sides must reuse one exchange)")
      assert(exec.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }.nonEmpty, "the self-join's second side must reuse the first side's exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pair-verification rows plan at most two documents scans, no cartesian") {
    // The round-10 single-aggregate plans (signatures + carried
    // shingle-hash sets, bands folded off the same frame via
    // `bandsOfSigs`). Catalyst column-prunes the band branch into a
    // second, narrower aggregate — 2 scans is the planned shape
    // (forcing 1 would need a corpus-sized persist). THREE scans means
    // someone reintroduced the from-scratch lshPairs pipeline next to
    // the set aggregate — the pre-round-10 shape.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("llm_minhash_jaccard_est", "llm_containment").foreach { q =>
        val exec = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
        val scans = exec.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.size <= 2,
          s"$q must plan at most 2 documents scans; found ${scans.size}")
        assert(exec.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.isEmpty, s"$q must not plan a cartesian product")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("llm_cosine_topk broadcasts the query side (one corpus scan, no shuffle of it)") {
    val p = plan("llm_cosine_topk")
    assert(p.contains("Broadcast"), "queries must broadcast against the corpus")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must push a group-limit below the window sort")
  }

  test("llm_decontaminate broadcasts the eval side (corpus never shuffles for the join)") {
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "eval shingles must broadcast")
  }

  test("j13_range_join plans as an equi-join, not a nested-loop theta join") {
    val p = plan("j13_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the bucketed rewrite must avoid the theta-join nested loop")
  }

  test("s_bucketize_join joins co-located buckets with no exchange below the join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("s_bucketize_join")(spark, dir)
      val exec = df.queryExecution.executedPlan
      val smj = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "bucketed join must stay sort-merge (not broadcast)")
      val below = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(below.isEmpty,
        "bucketed scans must feed the join directly — a shuffle here means the " +
          "bucket partitioning was lost (the whole point of the rewrite)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("j15_click_attribution joins on the user equi-key, not a nested loop") {
    val p = plan("j15_click_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the interval condition must ride the user_id equi-join as a residual " +
        "filter — a nested loop here is quadratic in events per time window")
  }

  test("w8_scd2_history runs both windows over one shuffle on user_id") {
    // AQE hides its inner tree from plan.collect — with it on, the
    // exchange count is always 0 and the assertion would be vacuous.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("w8_scd2_history")(spark, dir)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      // One hash partitioning on user_id shared by lag + lead, plus the
      // final global ORDER BY range exchange — nothing else.
      assert(exchanges.nonEmpty, "AQE must be off so the plan is inspectable")
      assert(exchanges.size <= 2,
        s"SCD2 build must reuse the user_id partitioning across its windows, " +
          s"got ${exchanges.size} exchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ts1_gapfill_interp is single-scan: lead+explode, no spine join") {
    // AQE hides its inner tree from plan.collect (see the jaccard lock).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("ts1_gapfill_interp")(spark, dir)
      val exec = df.queryExecution.executedPlan
      assert(exec.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.size === 1, "gap-fill must read events exactly once (lead-pair form, " +
        "not the double-reading spine-join form)")
      assert(exec.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, "gap-fill must not plan any join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // The 100 TB lever Catalyst provides for free when the join is
    // declarative: a selective filter on the dimension side turns into a
    // bloom_filter_agg whose might_contain() is pushed into the fact
    // scan, so most fact rows die before the shuffle. Thresholds are
    // size-based (default: creation side < 10 MB, application side >
    // 10 GB) — forced here since testdata is tiny on both counts.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = graft.sources.Tables.load(spark, dir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val p = li.join(ord,
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
        "selective dim join must inject a runtime bloom filter on the fact side")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("corpus-stats rows tokenize the corpus once (AQE reuses the docWords shuffle)") {
    // llm_unigram_lm / llm_tfidf_topk derive vocabulary statistics AND
    // join them back to the same (doc_id, word) aggregate. If the
    // branches' canonical plans drift apart (e.g. a count(*) lets the
    // optimizer column-prune one branch), each branch re-tokenizes the
    // whole corpus — at 100 TB that doubles the most expensive stage.
    // The final adaptive plan must show the shared shuffle stage reused.
    for (name <- Seq("llm_unigram_lm", "llm_tfidf_topk", "llm_quality_buckets",
        "llm_ppl_buckets")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // AQE resolves reuse at runtime; inspect the final plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"$name must reuse the tokenize shuffle across its branches")
    }
  }

  test("llm_incremental_dedup probes the lake index once (one signature pass, no row multiplication)") {
    // The batch-vs-lake probe must compute the minhash signature
    // pipeline ONCE — at 100 TB it is the dominant cost and must not
    // run twice — and must never row-multiply the batch. Round 14
    // replaced the semi-join-with-ReusedExchange shape (which join
    // reordering kept splitting into two signature subtrees once the
    // signatures went map-side) with a bucket-keyed window over the one
    // tagged band table: same membership, one band-key exchange, and
    // the single-pass property holds by CONSTRUCTION — exactly one
    // minhash_sigs projection in the final plan.
    val df = SparkEntry.queries("llm_incremental_dedup")(spark, dir)
    df.collect() // AQE finalizes the plan; inspect the executed tree
    // AdaptiveSparkPlan.toString appends an "== Initial Plan ==" section
    // after the final plan — count only the final section.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val sigs = "minhash_sigs".r.findAllIn(p).size
    assert(sigs === 1,
      s"the corpus must be signed exactly once; found $sigs minhash_sigs projections")
    assert(p.contains("Window"), "the lake probe must be the bucket-keyed window")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere in the probe")
  }

  test("llm_bm25_topk tokenizes the corpus once (windowed df/length, no idf join)") {
    // BM25's corpus-proportional work must be ONE tokenize-aggregate
    // stream with stacked windows: a length JOIN would infer the
    // doc_id >= 10 constraint onto its branch and fork a second full
    // tokenize scan (observed before the rewrite). The only second
    // read allowed is the shuffle-free (n_docs, total_len) scalar pair.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("llm_bm25_topk")(spark, dir)
      val exec = df.queryExecution.executedPlan
      val tokenizes = exec.collect {
        case g: org.apache.spark.sql.execution.GenerateExec
            if g.boundGenerator.toString.contains("split") => g
      }
      assert(tokenizes.size === 1,
        s"corpus must be tokenized exactly once; found ${tokenizes.size} " +
          "explode(split(text)) generators")
      val scans = exec.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
      assert(scans.size <= 2,
        s"at most the token stream + the stats scalar may read documents; " +
          s"found ${scans.size} scans")
      assert(exec.toString.contains("WindowGroupLimit"),
        "top-5 rank filter must plan as WindowGroupLimit")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("s15 literal lang filter is satisfied by STATIC partition pruning") {
    val p = plan("s15_partition_prune")
    // The filter must appear as a partition-directory predicate on the
    // scan, not a per-row data filter over all partitions.
    assert(p.contains("PartitionFilters") && p.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      "lang = 'en' must prune at the directory level")
    assert(!p.matches("(?s).*PushedFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      "lang must not degrade into a row-group data filter")
  }

  test("llm_bm25_indexed postings scan is dynamic-partition-pruned to the query terms' buckets") {
    val p = plan("llm_bm25_indexed")
    assert(p.contains("dynamicpruning"),
      "postings scan must prune wb buckets from the broadcast query-term set")
  }

  test("no query plan contains a cartesian product over base tables") {
    // The only sanctioned cross joins are the ~100-row week spine and
    // broadcast query sets; a CartesianProduct node means a shuffle-side
    // cartesian slipped in.
    for (name <- Seq("llm_cosine_neardup", "llm_minhash_lsh_pairs",
        "llm_ngram_jaccard", "llm_ann_ivf", "llm_substr_spans",
        "llm_dup_triangles", "llm_kmeans_embed", "llm_pq_adc")) {
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("a24_funnel_steps stacks all three step windows over ONE user_id shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("a24_funnel_steps")(spark, dir)
      val exec = df.queryExecution.executedPlan
      val windows = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.size === 3, s"expected 3 stacked windows, got ${windows.size}")
      // the topmost window's subtree must contain exactly ONE exchange:
      // the user_id hash partitioning all three stacked windows share.
      // (The global multi-distinct aggregate above them adds its own
      // tiny Expand/exchange pair — that's the aggregate, not the log.)
      val belowWindows = windows.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(belowWindows.size === 1,
        s"step windows must share one user_id shuffle; found ${belowWindows.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("llm_blocklist_substr is a pure map-side scan (no join, no aggregate shuffle)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("llm_blocklist_substr")(spark, dir)
      val exec = df.queryExecution.executedPlan
      val shuffles = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the only exchange is the verify dump's final range sort
      assert(shuffles.size <= 1,
        s"automaton scan must stay map-side; found ${shuffles.size} exchanges")
      assert(!exec.toString.contains("Join"), "no join may appear")
      val scans = exec.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size === 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("llm_kmeans_embed / llm_pq_adc broadcast centroid tables, never shuffle-join the corpus") {
    for (name <- Seq("llm_kmeans_embed", "llm_pq_adc")) {
      val p = plan(name)
      // assignment joins must be broadcast (nested-loop over a K-row
      // centroid table is the sanctioned shape); a SortMergeJoin against
      // the corpus would mean the centroids forced a corpus shuffle.
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$name must broadcast the centroid side")
      assert(!p.contains("SortMergeJoin"),
        s"$name must not sort-merge-join the corpus against centroids")
    }
  }

  test("llm_ann_ivf_inc probes the incrementally-built index with dynamic partition pruning") {
    val p = plan("llm_ann_ivf_inc")
    assert(p.contains("dynamicpruning"),
      "the incrementally-maintained corpus scan must keep the same pruning as the full build")
  }

  test("llm_exact_k_sample pays its rank window only on the overshoot survivors") {
    // The per-stratum threshold join must be broadcast (counts table is
    // |strata| rows) and the hash filter must sit BELOW the window, so
    // the sort state is survivor-sized, never corpus-sized.
    val p = plan("llm_exact_k_sample")
    assert(p.contains("BroadcastHashJoin"), "threshold table must broadcast")
    val winIdx = p.indexOf("Window")
    val filterIdx = p.lastIndexOf("Filter")
    assert(winIdx >= 0 && filterIdx > winIdx,
      "the overshoot filter must execute below the rank window in the plan tree")
  }

  test("llm_pq_incremental scores via a broadcast ADC table over the codes scan") {
    val p = plan("llm_pq_incremental")
    assert(p.contains("BroadcastHashJoin"),
      "the |Q|*M*K ADC table must broadcast against the codes")
    assert(!p.contains("SortMergeJoin"),
      "the corpus codes must never shuffle for the ADC probe")
  }

  test("simhash blocked-permutation scheme emits exactly the banded scheme's pairs") {
    // Both blocking schemes have recall 1 for hamming <= 3 (4-band
    // pigeonhole vs the Manku-Jain-Sarma C(6,3) block combinations), so
    // the verified pair set must be IDENTICAL — this is what lets the
    // auto-selected 100 TB path share the small-corpus oracle.
    def pairsUnder(scheme: String): Set[(Long, Long, Int)] = {
      spark.conf.set("spark.graft.simhashScheme", scheme)
      try graft.llm.DedupOps.simhashPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      finally spark.conf.unset("spark.graft.simhashScheme")
    }
    val banded = pairsUnder("banded")
    val blocked = pairsUnder("blocked")
    assert(banded.nonEmpty, "test corpus must produce at least one near-dup pair")
    assert(blocked === banded)
  }

  test("simhash auto scheme picks banded below the threshold, blocked above") {
    // The threshold dial makes the auto decision testable at toy scale.
    def planUnder(threshold: String): String = {
      spark.conf.set("spark.graft.simhashBlockedThreshold", threshold)
      try graft.llm.DedupOps.simhashPairs(spark, dir)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.graft.simhashBlockedThreshold")
    }
    // Banded: 4 keys/doc — the posexplode array has 4 entries; blocked:
    // C(6,3)=20 combo keys built by shift/mask off the packed signature.
    assert(!planUnder((1L << 20).toString).contains("shiftrightunsigned"),
      "small corpus must take the banded path")
    assert(planUnder("1").contains("shiftrightunsigned"),
      "corpus above the threshold must take the blocked-permutation path")
  }

  test("llm_collocations: bounded top-k, MERGE vocab joins, min-count filter below the joins") {
    val p = plan("llm_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-20 must be a bounded top-k, never a global sort")
    assert("SortMergeJoin".r.findAllIn(p).length >= 2,
      "both vocabulary joins must stay sort-merge (broadcast of a corpus-sized side is the 30x trap)")
    // The cb >= 5 candidate filter must sit BELOW the joins (on the
    // aggregated bigram side), so only collocation candidates reach them.
    assert(p.contains("(cb"), "min-count filter must survive in the plan")
  }

  test("llm_zipf_fit ranks only the top-1000 (no global window over the vocabulary)") {
    val p = plan("llm_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"),
      "top-1000 must be TakeOrderedAndProject, not a full vocabulary sort")
  }

  test("a27_basket_pairs: pair and support branches share one basket exchange, no cartesian") {
    // The pair-mine must derive pair counts AND singleton supports from
    // the SAME per-order basket aggregate: if the branches' canonical
    // plans drift apart, the fact table is aggregated twice — at 100 TB
    // that doubles the dominant stage. The 1-row order-count branch is
    // ALLOWED its own column-pruned scan (one narrow column, cheaper
    // than pinning the fat exchange), so scans ≤ 2 — never the 8 the
    // naive four-branch items plan produced.
    val df = SparkEntry.queries("a27_basket_pairs")(spark, dir)
    df.collect() // AQE resolves reuse at runtime; inspect the final plan
    val exec = df.queryExecution.executedPlan
    val p = exec.toString
    assert(p.contains("ReusedExchange"),
      "pair counts and supports must reuse one basket aggregate exchange")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    val scans = collectLeaves(exec).count(_.isInstanceOf[
      org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans <= 2, s"expected at most 2 lineitem scans, found $scans")
  }

  test("llm_allpairs_jaccard: one corpus scan feeds the class aggregate; prefix join is an equi-join on w; verify is the carried-set intersect") {
    // VERDICT r12 #1 (the round's one weak row): the PPJoin rewrite's
    // scale-safety claims, asserted on the runtime plan. AQE resolves
    // exchange reuse at runtime, so run the frame first.
    val df = SparkEntry.queries("llm_allpairs_jaccard")(spark, dir)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val p = exec.toString
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    // Candidate generation is an EQUI-join keyed on the prefix token w —
    // the sig inequality and the 10·min >= 7·max length filter ride as
    // the join CONDITION. A hot token cannot blow this up: high-df
    // shingles order to the back of every set and never enter a prefix.
    assert("""Join \[w#\d+L?\], \[w#\d+L?\]""".r.findFirstIn(p).nonEmpty,
      "prefix candidate join must be an equi-join on the shingle hash w")
    // Verification intersects the CARRIED sets inside the candidate join
    // — no second join back against the corpus or the shingle stream.
    assert(p.contains("array_intersect"),
      "verify must be the carried-set intersect, not a corpus re-join")
    // The shingle → set → class pipeline plans once: every other
    // consumer reuses its exchange, so the FINAL plan scans documents
    // exactly once (the pre-AQE tree shows 7 scans; reuse collapses them).
    val scans = collectLeaves(exec).count(_.isInstanceOf[
      org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans === 1,
      s"documents must be scanned once via exchange reuse, found $scans")
  }

  /** Collect leaves across AQE's nested-stage boundaries. */
  test("a28_hll_intersect plans WITHOUT an Expand (keyed pre-aggregation, not multi-distinct)") {
    // The round-11 rewrite: a multi-countDistinct compiles to an N-way
    // Expand of the raw scan (600M intermediate rows at sf10, 82 s);
    // the daily-active-keyed pre-aggregation + conditional-sum final
    // agg must keep the plan Expand-free.
    val p = plan("a28_hll_intersect")
    assert(!p.contains("Expand"), "a28 regressed to an Expand-based multi-distinct")
  }

  test("s22c_profile_approx_prod (the 100 TB profile path) plans WITHOUT an Expand") {
    // Exact multi-column COUNT(DISTINCT) is Catalyst's Expand rewrite
    // (rows × ncols intermediate); the approx profile must ship one HLL
    // sketch per column per partition instead — no Expand anywhere.
    val p = plan("s22c_profile_approx_prod")
    assert(!p.contains("Expand"),
      "approx profile regressed to an Expand-based exact multi-distinct")
  }

  test("a27b_basket_pairs_pruned semi-joins baskets against a BROADCAST qualifying set pre-explode") {
    // The Apriori dial: infrequent parts leave every basket via a
    // broadcast left-semi join BEFORE pair expansion. A shuffled semi
    // join here would re-shuffle the items relation against a set the
    // premise says is small; losing the semi join entirely means the
    // prune is gone and the candidate-pair space is quadratic again.
    val p = plan("a27b_basket_pairs_pruned")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "qualifying-singleton prune must be a broadcast left-semi join")
    assert(!p.contains("CartesianProduct"))
  }

  test("a27c_basket_pairs_relsup derives the threshold in-plan and prunes via broadcast semi join") {
    // The RELATIVE dial: the cutoff is ceil(rel * n_orders) computed
    // from a 1-row broadcast of the basket count — no driver
    // round-trip — and the prune itself stays the broadcast left-semi
    // shape the absolute dial locks.
    val p = plan("a27c_basket_pairs_relsup")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "qualifying-singleton prune must be a broadcast left-semi join")
    assert(p.toLowerCase.contains("ceil"),
      "the relative threshold must be computed inside the plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("g1_geo_radius_join broadcasts the fanned-out small side and prefilters before the trig") {
    val p = plan("g1_geo_radius_join")
    assert(p.contains("BroadcastHashJoin"),
      "the supplier side (9-cell fan-out) must broadcast — a sort-merge here shuffles the corpus")
    assert(!p.contains("CartesianProduct"))
    // The bounding-box prefilter must sit in the join condition or a
    // filter ABOVE the join but BEFORE the haversine projection — its
    // cheap comparisons are what keep the trig off most candidates.
    assert(p.contains("4.51"), "bounding-box lat prefilter missing from the physical plan")
  }

  test("ts3_locf_ffill uses only RUNNING window frames (no unbounded-following)") {
    // Spark's UnboundedFollowingWindowFunctionFrame re-evaluates the
    // aggregate from each row to partition end — O(n²) per partition.
    // A Zipf hot user (~2M events in one partition) turned that into a
    // single multi-hour task (r12, killed at 29 min). The bfill must be
    // the reversed RUNNING frame instead — same value, O(n).
    val p = plan("ts3_locf_ffill")
    assert(!p.contains("unboundedfollowing") && !p.contains("UNBOUNDED FOLLOWING"),
      "bfill must ride a descending running frame, not an unbounded-following frame")
    assert(p.contains("unboundedpreceding") || p.contains("UNBOUNDED PRECEDING"),
      "running frames missing — the plan no longer computes the fills via windows?")
  }

  private def collectLeaves(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val direct = p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectLeaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectLeaves(q.plan)
    }
    direct.flatten
  }
}
