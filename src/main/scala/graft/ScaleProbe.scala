package graft

import org.apache.spark.sql.functions._

/** Scale probe (dev tool, not part of the driver contract): replicate the
  * sf0.1 documents/embeddings tables N× with shifted ids into /tmp and
  * time the heaviest operators there, to catch superlinear blowups (LSH
  * bucket collisions, pair explosions) before they surface at real scale.
  * Run: `sbt "runMain graft.ScaleProbe [N] [q_name,...]"` (default 10 →
  * ~50k docs, all probes). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // both args optional: a non-numeric first arg is the probe filter
    val (n, only) = args.toList match {
      case num :: rest if num.nonEmpty && num.forall(_.isDigit) =>
        (num.toInt, rest.headOption.map(_.split(",").toSet))
      case filt :: _ => (10, Some(filt.split(",").toSet))
      case Nil => (10, None)
    }
    val spark = graft.core.GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_${n}x"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    // stride by max(id)+1, not row count: sparse or 1-based ids would make
    // count-strided replicas collide and plant phantom exact duplicates
    val nDocs = docs.agg(max($"doc_id")).head.getLong(0) + 1
    val nEmbs = embs.agg(max($"vec_id")).head.getLong(0) + 1
    (0 until n).map { i =>
      docs.withColumn("doc_id", $"doc_id" + lit(i * nDocs))
        // perturb the text per replica so replicas are not exact dups
        .withColumn("text", concat($"text", lit(s" replica$i")))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$out/documents.parquet")
    (0 until n).map { i =>
      embs.withColumn("vec_id", $"vec_id" + lit(i * nEmbs))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // events replicate by user population (ids AND event ids shifted):
    // N× users with the same per-user activity — the growth axis the
    // behavior family (q98/q101/q102/q115/q116) scales along
    val events = spark.read.parquet(s"$src/events.parquet")
    val nUsers = events.agg(max($"user_id")).head.getLong(0) + 1
    val nEvents = events.agg(max($"event_id")).head.getLong(0) + 1
    (0 until n).map { i =>
      events
        .withColumn("user_id", $"user_id" + lit(i * nUsers))
        .withColumn("event_id", $"event_id" + lit(i * nEvents))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$out/events.parquet")
    // remaining tables are linked unmodified
    graft.core.Tables.all
      .filterNot(t => t == "documents" || t == "embeddings" || t == "events")
      .foreach { t =>
        val p = java.nio.file.Paths.get(s"$out/$t.parquet")
        if (!java.nio.file.Files.exists(p))
          java.nio.file.Files.createSymbolicLink(
            p, java.nio.file.Paths.get(s"$src/$t.parquet"))
      }

    val allProbes = Seq("q46_exact_dedup", "q47_minhash_lsh", "q48_ngram_jaccard",
      "q49_simhash", "q50_embedding_neardup", "q51_knn_brute", "q52_ann_lsh",
      "q53_ann_ivf", "q77_dedup_keep", "q87_corpus_pipeline",
      "q89_decontaminate", "q91_quantize_int8", "q93_stratified_mix",
      "q95_dedup_components", "q98_concurrency", "q99_fuzzy_neardup",
      "q101_funnel", "q102_retention", "q105_chunk_overlap",
      "q106_incremental_dedup", "q107_containment", "q115_transitions",
      "q116_conversion_lag",
      "q120_fuzzy_lsh", "q121_containment_prefix", "q122_shard_assign",
      "q123_minhash_estimate", "q124_token_budget", "q125_ring_negatives",
      "q126_norm_dedup", "q127_source_overlap", "q129_span_copy",
      "q132_topk_agg", "q133_weighted_sample", "q134_span_scrub",
      "q135_lsh_scurve", "q136_unigram_bits", "q137_pmi_collocations",
      "q139_walk_rank", "q140_dsir_weights", "q141_cdc_chunks",
      "q142_quality_gate", "q143_k_anonymity", "q144_dup_weights",
      "q145_curriculum", "q146_zipf_slope", "q147_overlap_join",
      "q148_mad_gate", "q149_decay_score", "q150_psi_drift",
      "q151_stitch_pairs", "q152_rrf_fusion", "q154_rolling_anomaly",
      "q156_calibration", "q158_boundary_deciles", "q159_source_novelty",
      "q160_attribution", "q164_heavy_hitters", "q165_snapshot_diff",
      "q169_rank_auc", "q170_eval_split", "q171_bigram_bits",
      "q172_cluster_reps", "q173_semantic_dedup", "q174_phrase_hitters",
      "q175_winnow", "q176_cooccur", "q177_semantic_decontam",
      "q178_dedup_audit", "q179_ccnet_buckets", "q180_datacard",
      "q181_centroid_diag", "q182_quantile_sketch",
      "q183_bm25", "q184_hybrid_retrieval", "q185_sorted_neighborhood",
      "q186_prototype_prune", "q187_matryoshka_recall",
      "q188_kcenter_coreset", "q189_heaps_growth", "q190_domain_tagger",
      "q191_lang_diversity", "q192_mislabel_screen", "q193_reshard_census",
      "q194_media_dedup", "q197_retrieval_eval", "q199_ivf_lifecycle",
      "q200_index_census", "q201_semdup_by_source", "q202_cms_freq",
      "q203_quality_classifier", "q204_bitext_margin",
      "q206_curation_funnel", "q207_learnability_select",
      "q208_filtered_ann", "q210_heldout_ppl", "q211_preference_pairs",
      "q212_suffix_dedup", "q213_pii_census", "q214_exact_scrub",
      "q215_probe_recall", "q216_epoch_alloc", "q217_semantic_order",
      "q218_late_interaction", "q219_weak_labels", "q220_doremi_weights",
      "q221_forget_audit", "q222_trained_filter", "q223_pack_shard",
      "q224_drop_reasons", "q225_ppl_buckets", "q226_semantic_decontam",
      "q227_cdc_apply", "q228_rank_fusion", "q229_tokenizer_fertility",
      "q230_incremental_census", "q231_memorization", "q232_gate_ablation",
      "q233_unimax_alloc", "q234_merge_curve", "q235_release_manifest",
      "q236_sql_lateral_alias", "q237_token_entropy",
      "q238_exposed_evals", "q239_pack_purity",
      "q240_boundary_pack", "q241_forget_census", "q242_trained_eval",
      "q243_bfd_pack", "q244_sql_variant", "q245_sql_session_vars",
      "q246_export_manifest", "q247_gate_calibration",
      "q248_calibrated_release", "q249_shard_export",
      "q250_export_forget", "q251_sql_listagg", "q252_zorder_skip",
      "q253_hilbert_locality", "q254_equidepth_codes",
      "q255_epoch_materialize", "q256_training_stream",
      "q257_web_extract", "q258_stream_forget",
      "q259_vocab_artifact", "q260_curved_write",
      "q261_substr_decontam", "q262_decontam_scrub",
      "q263_band_index",
      // round 11 (events/documents-axis queries only: the TPC-H pack
      // reads the symlinked star tables, which don't replicate, and
      // q270's five stores are each probed via their own family rows)
      "q264_multiscreen", "q265_bind_cohort", "q266_new_open_cohort",
      "q268_cpsp_rollup", "q269_image_decode", "q293_monitor_report",
      // round 12 (q296 reads the symlinked star tables — excluded like
      // the TPC-H pack)
      "q294_suffix_compact", "q295_audio_decode", "q297_video_demux")
    val specials = Seq("kmeans_lloyd", "cc_path", "containment_lowcol",
      "bpe_train", "bpe_encode", "bloom_semi", "walk_rank_e")
    only.foreach(req => (req -- allProbes.toSet -- specials.toSet)
      .foreach(u => println(s"[scale] WARNING: unknown probe '$u' ignored")))
    val probes = allProbes.filter(p => only.forall(_.contains(p)))
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale ${n}x] $name%-24s ${sec}%8.2f s   $rows%9d rows")
    }
    probes.foreach { name =>
      timed(name)(SparkEntry.queries(name)(spark, out).count())
    }

    def want(p: String) = only.forall(_.contains(p))

    // IVF trainer at N×: assignment cost must scale linearly in rows and
    // seeding must stay flat (TakeOrdered top-1 per round, no global
    // window) — VERDICT r3 items 1/5
    if (want("kmeans_lloyd")) {
      val e = spark.read.parquet(s"$out/embeddings.parquet")
      timed("kmeans_lloyd(k=8,it=3)") {
        graft.operators.KMeans.lloyd(e, "vec_id", "embedding", k = 8, iters = 3)
          .count()
      }
    }

    // adversarial-diameter CC: a 10⁶-node path. Diameter-bound
    // min-propagation provably cannot finish (throws at maxIter=10);
    // alternating-star must converge in O(log n) rounds — the asymptotic
    // claim minLabel's scaladoc defers to, measured not asserted
    if (want("cc_path")) {
      val nodes = 1000000L
      val path = spark.range(0L, nodes - 1)
        .select($"id".as("src"), ($"id" + 1L).as("dst"))
        .repartition(32)
      timed(s"cc_path minLabel(10rd)") {
        try {
          graft.operators.ConnectedComponents
            .minLabel(path, "src", "dst", maxIter = 10).count()
        } catch {
          case _: IllegalStateException =>
            println(s"[scale] minLabel: unconverged after 10 rounds on " +
              s"diameter ${nodes - 1} (expected — diameter-bound)"); 0L
        }
      }
      var rounds = 0
      timed(s"cc_path altStar(n=$nodes)") {
        graft.operators.ConnectedComponents
          .alternatingStar(path, "src", "dst", onRound = r => rounds = r)
          .count()
      }
      println(s"[scale] alternatingStar converged in $rounds rounds " +
        s"(log2(n) = ${(math.log(nodes.toDouble) / math.log(2)).round})")
    }

    // walk-rank per-iteration cost must be linear in E: time the SAME
    // fixed-point loop on 1x and Nx DISJOINT copies of the lineitem
    // bipartite graph (shifted keys — identical degree structure, N×
    // edges) — the q139 scaladoc's O(E)/iteration claim, measured
    if (want("walk_rank_e")) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      val (nO, nP) = (li.agg(max($"o")).head.getLong(0) + 1,
        li.agg(max($"p")).head.getLong(0) + 1)
      def rep(k: Int) = (0 until k).map(i =>
        li.select(($"o" + lit(i * nO)).as("o"), ($"p" + lit(i * nP)).as("p")))
        .reduce(_ union _)
      for (k <- Seq(1, n)) timed(s"walk_rank_e ${k}x") {
        graft.operators.WalkRank.bipartite(rep(k), "o", "p", iters = 3).count()
      }
    }

    // BPE vocabulary induction: training runs on the word HISTOGRAM, so
    // corpus replication (which barely grows the distinct-word set) must
    // leave the cost flat — the scale claim in BpeTrainer's scaladoc
    if (want("bpe_train")) {
      val docs = spark.read.parquet(s"$out/documents.parquet")
      timed("bpe_train(30 merges)") {
        graft.operators.BpeTrainer.train(docs, "text", nMerges = 30).size.toLong
      }
    }

    // BPE ENCODING at N×: train once on the 1× corpus (vocabulary is a
    // histogram property — flat under replication, row above), then
    // tokenize the N× corpus with the rank-heap encoder. The claim:
    // encoding is a narrow typed map under a KB-sized broadcast rank
    // table, so throughput is linear in corpus bytes with no shuffle —
    // the production tokenizer-application shape
    if (want("bpe_encode")) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val merges = graft.operators.BpeTrainer.trainBatched(base, "text", 50)
      val big = spark.read.parquet(s"$out/documents.parquet")
      for (df <- Seq(base, big); label = if (df eq base) "1x" else s"${n}x")
        timed(s"bpe_encode $label") {
          graft.operators.BpeTrainer.tokenize(df, "doc_id", "text", merges)
            .agg(sum($"n_bpe_tokens")).head.getLong(0)
        }
    }

    // containment on a REAL-TEXT-regime corpus (perturbed vocabulary):
    // per-base-doc salted content — replicas of one base doc share
    // shingles (the true near-dups), distinct bases never collide — PLUS
    // an 8-token per-group boilerplate header (group = doc_id % 250),
    // the Zipfian hot shingles that connect ~n/250 UNRELATED docs at
    // sub-threshold overlap. The grouped self-join pays Σdeg² on the
    // boilerplate; the frequency-ordered prefix filter never puts
    // boilerplate in a prefix, so those pairs are pruned before any
    // intersection counting — VERDICT r3 item 3
    if (want("containment_lowcol")) {
      val salted = spark.read.parquet(s"$out/documents.parquet")
        .withColumn("base", $"doc_id" % lit(nDocs))
        .withColumn("gid", $"doc_id" % lit(250))
        .withColumn("text", concat(
          array_join(transform(sequence(lit(0), lit(7)),
            j => concat(lit("bp"), $"gid", lit("_"), j)), " "),
          lit(" "),
          array_join(transform(split(trim($"text"), "\\s+"),
            x => concat(x, lit("#"), $"base")), " ")))
        .select($"doc_id", $"text")
      salted.write.mode("overwrite").parquet(s"$out/documents_lowcol.parquet")
      val low = spark.read.parquet(s"$out/documents_lowcol.parquet")
      timed("containment grouped") {
        graft.operators.NearDup
          .containmentPairsGrouped(low, "doc_id", "text", 3, 8, 10).count()
      }
      timed("containment prefix") {
        graft.operators.NearDup
          .containmentPairs(low, "doc_id", "text", 3, 8, 10).count()
      }
    }
    // bloom-pruned vs plain semi-join at N× fact volume: on one box the
    // shuffle is memory-local, so the honest wall-clock claim is parity;
    // the 100 TB win is the PRUNE FRACTION (rows dropped before the
    // exchange), which is printed alongside
    if (want("bloom_semi")) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val nLi = li.agg(max($"l_orderkey")).head.getLong(0) + 1
      val fact = (0 until n).map { i =>
        li.withColumn("l_orderkey", $"l_orderkey" + lit(i * nLi))
      }.reduce(_ union _)
      val ord = spark.read.parquet(s"$src/orders.parquet")
      val dim = (0 until n).map { i =>
        ord.withColumn("o_orderkey", $"o_orderkey" + lit(i * nLi))
      }.reduce(_ union _)
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000.0)
        .select($"o_orderkey")
      fact.write.mode("overwrite").parquet(s"$out/li_big.parquet")
      dim.write.mode("overwrite").parquet(s"$out/ord_sel.parquet")
      val f = spark.read.parquet(s"$out/li_big.parquet")
      val d = spark.read.parquet(s"$out/ord_sel.parquet")
      timed("semi plain") {
        f.join(d.select($"o_orderkey".as("l_orderkey")).distinct(),
          Seq("l_orderkey"), "left_semi").count()
      }
      timed("semi bloom-pruned") {
        graft.operators.BloomJoin
          .prunedSemiJoin(f, "l_orderkey", d, "o_orderkey", 100000L * n).count()
      }
      val sk = graft.operators.BloomJoin.buildSketch(d, "o_orderkey", 100000L * n)
      val total = f.count()
      val pass = f.filter(graft.operators.BloomJoin.mightContain(sk, $"l_orderkey")).count()
      println(f"[scale] bloom prune: $pass%d of $total%d fact rows reach the " +
        f"shuffle (${100.0 * (total - pass) / total}%.1f%% dropped map-side)")
    }
    spark.stop()
  }
}
