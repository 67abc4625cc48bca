package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the driver-contract mains (Bench/Verify),
  * single-sourced so the two tools can't drift: the SPARK_GRAFT_ONLY dev
  * filter and JSON string escaping.
  */
object ToolSupport {
  type Query = (SparkSession, String) => DataFrame

  /** SPARK_GRAFT_ONLY=q_a,q_b selects a subset of the query map; unknown
    * names abort, so a typo'd partial run can never masquerade as a full
    * one. Returns the selected queries plus the parsed filter (Bench
    * echoes it in its JSON). Unset ⇒ the full map (the driver contract). */
  def onlyFilter(all: Map[String, Query]): (Map[String, Query], Option[Set[String]]) = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(all.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
    (only match {
      case Some(names) => all.filter(q => names(q._1))
      case None        => all
    }, only)
  }

  /** Execution-order sidecar body (SPARK_GRAFT_ORDER_OUT, r16 window-
    * calibration contract): {"<benchKey>": <runIndex>} in the exact order
    * Bench will time the queries. Lives here so the spec can pin the
    * format without driving a sweep; bench keys are benchKey-collision-
    * checked already, so the map can't silently alias two queries. */
  def orderJson(namesInRunOrder: Seq[String]): String =
    namesInRunOrder.zipWithIndex.map { case (n, i) =>
      // jstr, not raw interpolation: benchKey output is plain today, but
      // an exotic future key must corrupt nothing (jstr's own contract)
      s"${jstr(benchKey(n))}:$i"
    }.mkString("{", ",", "}")

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL or an exception message would
    * otherwise break the driver's json.load and silently zero a round. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  /** Stable short keys for the bench contract line's "queries" map: the
    * uniform "q_" prefix dropped plus a fixed token-abbreviation table.
    * Purely a WIRE format for the 2000-char capture window — Verify,
    * CORRECTNESS and the query registry keep full names; the mapping is
    * deterministic (mechanical to reverse) and collision-checked in
    * ToolSupportSpec, so a new query name can never silently alias an
    * existing bench key. */
  val benchKeySubs: Seq[(String, String)] = Seq(
    "stream_" -> "st_", "window_" -> "win_", "roundtrip" -> "rt",
    "neardup" -> "nd", "distinct" -> "dist", "sessions" -> "sess",
    "importance" -> "imp", "diagnostics" -> "diag", "checkpoint" -> "ckpt",
    "decode" -> "dec", "manifest" -> "mf", "pipeline" -> "pipe",
    "survivors" -> "surv", "video_" -> "vid_", "frames" -> "frs",
    "feature_" -> "feat_", "matrix" -> "mx", "multimodal_" -> "mm_",
    "group_" -> "grp_", "outlier_" -> "outl_", "extract" -> "ext",
    "filter" -> "flt", "notnull" -> "nn", "domain_" -> "dom_",
    "percentile" -> "pct", "forecast" -> "fc", "metrics" -> "met",
    // r8 widening (106-entry catalog): keep the 95-entry wire model
    // under the driver's 2000-char tail window with headroom
    "join" -> "jn", "dedup" -> "dd", "mean_having" -> "mh",
    "tumbling" -> "tumb", "rollup" -> "rup", "windows" -> "win",
    "fingerprint" -> "fp", "repetition" -> "rep", "histogram" -> "hist",
    "select_" -> "sel_", "region_" -> "reg_", "pagerank" -> "pr",
    "snapshot_" -> "snap_", "inverted_index" -> "inv_idx",
    "temp_mix" -> "tmix", "jaccard" -> "jac", "blank_to_null" -> "b2null",
    "keepnull" -> "keepn", "sess_multi" -> "sessm", "curate_" -> "cur_",
    "bucketed_" -> "bkt_", "approx_" -> "apx_",
    // r8 second widening (114-entry catalog): same budget discipline
    "string_" -> "str_", "enrich_" -> "enr_", "model_" -> "mdl_",
    "schema_" -> "sch_", "exact_" -> "ex_", "ngram_" -> "ng_",
    "source_" -> "src_", "sample_" -> "smp_", "embed_" -> "emb_",
    "decontam" -> "decon", "audio_" -> "aud_", "image_" -> "img_",
    "minhash_" -> "mh_", "simhash_" -> "sh_", "quality" -> "qual",
    "merge_upsert" -> "mrg_up", "bpe_pairs" -> "bpe",
    "lag_gaps" -> "lag", "zorder" -> "zord",
    // fold order matters: "matrix"->"mx" above has already produced
    // corr_mx by the time this entry applies
    "corr_mx" -> "corr", "token_count" -> "tok_cnt",
    // r8 third widening (128-entry catalog): the analytics batch, plus a
    // squeeze of the long tail so the worst-case wire line keeps >=15%
    // headroom (these run AFTER the folds above, so the left side is the
    // already-shortened form)
    "vocab_coverage" -> "vocab", "moving_avg" -> "mavg",
    "copurchase" -> "copur", "dq_checks" -> "dq",
    "incr_agg" -> "iagg", "funnel" -> "funl", "cohort" -> "coh",
    "left_jn" -> "ljn", "limit_slice" -> "lslice", "pivot_ratio" -> "pivot",
    "null_split" -> "nsplit", "geo_county" -> "geocty",
    "outl_keepn" -> "okeepn", "full_outer" -> "fouter",
    "na_profile" -> "naprof", "sel_rename" -> "selren",
    "cv_tuning" -> "cvtune", "st_totals" -> "st_tot",
    "row_index" -> "rowidx", "chunk_win" -> "chwin",
    "cur_chain" -> "curch", "st_enrich" -> "st_enr",
    "st_curate" -> "st_cur", "asof_skew" -> "asofsk",
    "snap_diff" -> "snapd", "json_ext" -> "jext", "win_" -> "w",
    "bloom_dd" -> "bldd", "shard_mf" -> "shmf", "seq_pack" -> "spack",
    "jsonl_rt" -> "jlrt", "range_jn" -> "rngjn", "st_range" -> "st_rng",
    "sch_cast" -> "scast", "enr_pipe" -> "enrp", "emb_surv" -> "esurv",
    "ols_diag" -> "olsd", "apx_dist" -> "apxd", "st_sessm" -> "st_sm",
    "incr_dd" -> "idd", "feat_mx" -> "fmx", "aud_dec" -> "audd",
    "vid_frs" -> "vidf", "str_ext" -> "sext", "smp_mix" -> "smix",
    "dd_surv" -> "ddsv", "skew_jn" -> "skjn", "gbt_met" -> "gbtm",
    "dom_cap" -> "dcap", "tok_cnt" -> "tokc", "reg_rup" -> "rrup",
    "img_dec" -> "imgd", "semi_jn" -> "smjn", "anti_jn" -> "atjn",
    "src_sim" -> "ssim", "mm_meta" -> "mmeta", "edit_jn" -> "edjn",
    "asof_jn" -> "asofj", "ann_ivf" -> "aivf", "ann_topk" -> "atopk",
    "inv_idx" -> "iidx", "ols_met" -> "olsm",
    "winsorize" -> "winz", "cascade_delete" -> "cascd",
    "set_ops_all" -> "sopsa", "nullsafe_jn" -> "nsjn",
    "triangles" -> "tri", "latest_order" -> "lastord", "ab_test" -> "ab",
    "attribution" -> "attr",
    // r8 fourth widening (137-entry catalog): squeeze for tail headroom
    "st_funl" -> "stfn", "lastord" -> "lord", "geocty" -> "gcty",
    "okeepn" -> "okpn", "fouter" -> "fout", "naprof" -> "napf",
    "selren" -> "selr", "cvtune" -> "cvt", "lslice" -> "lsli",
    "rowidx" -> "ridx", "nsplit" -> "nspl", "asofsk" -> "asfk",
    "esurv" -> "esv", "spack" -> "spk",
    "freq_table" -> "freq", "heavy_hitters" -> "hh",
    "session" -> "sess", "ckpt_prune" -> "ckpt",
    // ("sample_" above has already turned resample_ffill into resmp_ffill)
    "resmp_ffill" -> "resamp", "date_" -> "dt_",
    "rare_other" -> "rare", "cond_update" -> "cond_up",
    "sliding" -> "slid", "rank_funcs" -> "ranks",
    // r8 fifth widening (143-entry catalog): the analytics/drift batch,
    // plus a squeeze of the remaining 6-8 char tail (left sides are the
    // post-fold forms, as above) to keep >=15% window headroom
    "time_weighted" -> "twa", "topk_group" -> "tkg",
    "lang_drift" -> "ldrift",
    "dt_parse" -> "dtp", "ljn_dist" -> "ljnd", "agg_sum" -> "asum",
    "ann_lsh" -> "alsh", "cond_up" -> "cdup", "lang_id" -> "lid",
    "na_drop" -> "nadr", "set_ops" -> "sops", "streaks" -> "stks",
    "st_sess" -> "stss", "st_sink" -> "stsk", "st_slid" -> "stsl",
    "st_tumb" -> "sttb", "b2null" -> "b2n", "markov" -> "mkv",
    "csv_rt" -> "csvr", "ldrift" -> "ldft", "cumsum" -> "csum",
    "grp_mh" -> "gmh", "minmax" -> "mnmx", "emb_nd" -> "embn",
    "geo_jn" -> "gjn", "mrg_up" -> "mgup", "dt_flt" -> "dtf",
    "bkt_jn" -> "bktj",
    "concurrency" -> "conc", "stickiness" -> "stky",
    "weighted_sample" -> "wsmp",
    "mdl_rt" -> "mdrt", "ng_jac" -> "ngj", "nn_flt" -> "nnf",
    "ols_fc" -> "olsf", "orc_rt" -> "orcr", "redact" -> "red",
    "resamp" -> "rsmp", "rf_imp" -> "rfim", "zscore" -> "zsc",
    "st_tot" -> "stt", "st_rng" -> "strg", "st_cur" -> "stc",
    "st_enr" -> "sten", "bigram_lm" -> "blm",
    // "percentile"->"pct" above has already produced pct_disc
    "pct_disc" -> "pctd",
    "atopk" -> "atk", "asofj" -> "asfj", "cascd" -> "casc",
    "cbind" -> "cbnd", "chisq" -> "chi2", "chwin" -> "chw",
    "copur" -> "copu", "curch" -> "cuch", "decon" -> "dcon",
    "ntile" -> "ntl", "pivot" -> "pvt", "rngjn" -> "rngj",
    "ranks" -> "rnks", "scast" -> "scst", "snapd" -> "snpd",
    "tfidf" -> "tfid", "union" -> "unio", "vocab" -> "vocb",
    "wsess" -> "wses", "wslid" -> "wsld", "wtumb" -> "wtmb",
    // "geo_jn"->"gjn" above leaves geo_nearest untouched
    "geo_nearest" -> "gnn", "calibration" -> "cal",
    "csvr" -> "csv", "jlrt" -> "jlr", "orcr" -> "orc", "mdrt" -> "mdr",
    "rsmp" -> "rsm", "olsf" -> "olf", "alsh" -> "als", "nadr" -> "nad",
    "cdup" -> "cdu", "stks" -> "stk", "sttb" -> "stb", "stsl" -> "ssl",
    // r8 final widening: systematic 3-char floor for every remaining
    // 4+-char key (applied LAST, longest left sides first so substring
    // pairs like sopsa/sops fold safely) — creates ~100 chars of window
    // headroom (worst-case model 1594/1700) so round 9 can grow the
    // catalog ~9 queries before touching this table again
    "ex_dd" -> "ex_", "mh_nd" -> "mh_", "mmeta" -> "mme", "sh_nd" -> "sh_",
    "sopsa" -> "sop", "st_dd" -> "st_", "st_sm" -> "sts", "aivf" -> "aiv",
    "apxd" -> "apx", "asfj" -> "asf", "asfk" -> "afk", "asum" -> "asu",
    "atjn" -> "atj", "attr" -> "att", "audd" -> "aud", "bktj" -> "bkt",
    "bldd" -> "bld", "bm25" -> "bm2", "casc" -> "cas", "cbnd" -> "cbn",
    "chi2" -> "chi", "ckpt" -> "ckp", "conc" -> "con", "copu" -> "cop",
    "corr" -> "cor", "csum" -> "csu", "cube" -> "cub", "cuch" -> "cuc",
    "dcap" -> "dca", "dcon" -> "dco", "ddsv" -> "dds", "dist" -> "dis",
    "edjn" -> "edj", "embn" -> "emb", "enrp" -> "enr", "fout" -> "fou",
    "freq" -> "fre", "funl" -> "fun", "gbtm" -> "gbt", "gcty" -> "gct",
    "hist" -> "his", "iagg" -> "iag", "iidx" -> "iid", "imgd" -> "img",
    "jext" -> "jex", "ldft" -> "ldf", "ljnd" -> "lnd", "lord" -> "lor",
    "lsli" -> "lsl", "mavg" -> "mav", "melt" -> "mel", "mgup" -> "mgu",
    "mnmx" -> "mnm", "napf" -> "nap", "nsjn" -> "nsj", "nspl" -> "nsp",
    "okpn" -> "okp", "olsd" -> "ols", "olsm" -> "osm", "pctd" -> "ptd",
    "qual" -> "qua", "rare" -> "rar", "rfim" -> "rfi", "ridx" -> "rid",
    "rngj" -> "rng", "rnks" -> "rnk", "rrup" -> "rru", "scd2" -> "scd",
    "scst" -> "scs", "selr" -> "sel", "sext" -> "sex", "shmf" -> "shm",
    "skjn" -> "skj", "smix" -> "smi", "smjn" -> "smj", "snpd" -> "snp",
    "sops" -> "sps", "ssim" -> "ssi", "sten" -> "ste", "stfn" -> "stf",
    "stky" -> "sky", "strg" -> "str", "stsk" -> "ssk", "stss" -> "sss",
    "tfid" -> "tfi", "tmix" -> "tmi", "tokc" -> "tok", "topk" -> "top",
    "unio" -> "uni", "vidf" -> "vid", "vocb" -> "voc", "winz" -> "win",
    "wses" -> "wse", "wsld" -> "wsl", "wsmp" -> "wsm", "wtmb" -> "wtm",
    "zord" -> "zor",
    // r8 addition after the 3-char floor: new keys enter pre-floored
    "grouping_sets" -> "gst", "conversion_window" -> "cvw", "equidepth" -> "edh",
    // r9 additions, same discipline: every new key enters at 3 chars
    "col_profile" -> "cpf", "value_drift" -> "vdf", "st_drift" -> "std",
    "stratified" -> "sfd", "anomaly" -> "ano", "apx_pct" -> "apc",
    // r9 2-char floor: the 161-entry catalog left 5 chars of window
    // headroom at the 3-char floor, so every 3-char key drops to a
    // unique 2-char code (left sides are exact post-floor keys — at this
    // stage every key is <=3 chars, so a 3-char left side can only match
    // a whole key, never a fragment of another). Banked headroom: ~160
    // chars (model 1539/1700). New keys enter pre-floored at 2 chars.
    "pvt" -> "pv", "asu" -> "as", "gmh" -> "gm", "rru" -> "rr",
    "rup" -> "ru", "csu" -> "cs", "cub" -> "cu", "mnm" -> "mn",
    "dis" -> "di", "fre" -> "fr", "his" -> "hi", "zsc" -> "zs",
    "met" -> "me", "cor" -> "co", "rsm" -> "rs", "mav" -> "ma",
    "fun" -> "fu", "coh" -> "ch", "nap" -> "na", "cdu" -> "cd",
    "b2n" -> "b2", "sel" -> "se", "scs" -> "sc", "dtf" -> "dt",
    "okp" -> "ok", "nnf" -> "nn", "nad" -> "nd", "nsp" -> "ns",
    "lsl" -> "ls", "rid" -> "ri", "sex" -> "sx", "dtp" -> "dp",
    "edj" -> "ed", "ljn" -> "lj", "uni" -> "un", "ntl" -> "nt",
    "top" -> "to", "rar" -> "ra", "mel" -> "ml", "pct" -> "pc",
    "ptd" -> "pt", "gst" -> "gs", "mad" -> "md", "edh" -> "eh",
    "apx" -> "ap", "apc" -> "ac", "olf" -> "ol", "osm" -> "os",
    "fmx" -> "fm", "rfi" -> "rf", "gbt" -> "gb", "cvt" -> "cv",
    "ex_" -> "ex", "mh_" -> "mh", "sh_" -> "sh", "ngj" -> "ng",
    "dds" -> "dd", "ssi" -> "ss", "idd" -> "id", "bld" -> "bl",
    "lid" -> "li", "qua" -> "qu", "tok" -> "tk", "tfi" -> "tf",
    "iid" -> "ii", "voc" -> "vo", "red" -> "re", "smi" -> "sm",
    "dca" -> "dc", "tmi" -> "tm", "spk" -> "sp", "chw" -> "cw",
    "dco" -> "do", "rep" -> "rp", "cuc" -> "cc", "shm" -> "hm",
    "snp" -> "sn", "tri" -> "tr", "mgu" -> "mg", "scd" -> "sd",
    "cpf" -> "cp", "iag" -> "ia", "cop" -> "op", "win" -> "wi",
    "cas" -> "ca", "zor" -> "zo", "bpe" -> "bp", "lag" -> "la",
    "atk" -> "at", "als" -> "al", "aiv" -> "ai", "emb" -> "em",
    "esv" -> "es", "mme" -> "mm", "img" -> "im", "aud" -> "au",
    "vid" -> "vi", "gct" -> "gc", "csv" -> "sv", "jlr" -> "jl",
    "orc" -> "or", "ckp" -> "ck", "bkt" -> "bk", "skj" -> "sk",
    "asf" -> "af", "afk" -> "ak", "rng" -> "rn", "mdr" -> "mr",
    "wtm" -> "wt", "wsl" -> "ws", "wse" -> "we", "stb" -> "st",
    "ssl" -> "sl", "sss" -> "s0", "sts" -> "ts", "ste" -> "te",
    "str" -> "sr", "ssk" -> "s1", "st_" -> "s_", "stc" -> "tc",
    "stf" -> "sf", "std" -> "td", "stt" -> "tt", "gjn" -> "gj",
    "cbn" -> "cb", "smj" -> "sj", "atj" -> "aj", "sps" -> "ps",
    "sop" -> "so", "nsj" -> "nj", "lor" -> "lo", "att" -> "a0",
    "rnk" -> "rk", "stk" -> "s2", "mkv" -> "mk", "chi" -> "ci",
    "twa" -> "tw", "cvw" -> "vw", "vdf" -> "vd", "ano" -> "an",
    "tkg" -> "tg", "ldf" -> "ld", "con" -> "cn", "sky" -> "sy",
    "wsm" -> "wm", "sfd" -> "fd", "blm" -> "bm", "bm2" -> "m2",
    "gnn" -> "gn", "cal" -> "cl", "fou" -> "fo", "ols" -> "o0",
    "enr" -> "en", "e2e" -> "e2", "jex" -> "je", "lnd" -> "ln",
    // r9 additions after the 2-char floor: new keys enter pre-floored
    "sim_jn" -> "pj",
    // ("triangles"->"tri"->"tr" has already turned retrieval_eval into
    // retreval_eval by this point — the left side is the folded form)
    "retreval_eval" -> "rv",
    // ("stky"->"sky"->"sy" folds skyline to syline before this table)
    "syline" -> "ky",
    // ("mh_"->"mh" has already turned mh_accuracy into mhaccuracy)
    "mhaccuracy" -> "m1", "benford" -> "bf",
    // fold order strikes again: stream_topk arrives here as "s_to" —
    // the left side below is that folded form, not the raw name
    "s_to" -> "t5", "changepoint" -> "cg",
    // ("group_"->"grp_", then "ols"->"o0" fold group_ols to grp_o0)
    "grp_o0" -> "go",
    // ("mh_"->"mh" folds mh_tabulation to mhtabulation)
    "mhtabulation" -> "m3", "s_cpt" -> "c1", "qunt_norm" -> "qn", "gini" -> "gy",
    // ("embed_"->"emb_"; "emb_nd"->... leaves emb_drift; then "emb"->"em")
    "em_drift" -> "e1", "ann_recll" -> "a1",
    // r10 addition ("session"->"sess" has already folded session_paths)
    "sess_paths" -> "s3",
    // r11 addition, pre-floored at 2 chars ("string_"->"str_", "dedup"->
    // "dd", then "str"->"sr" fold substring_dedup to subsr_dd)
    "subsr_dd" -> "sb",
    // r11 addition, pre-floored at 2 chars (no earlier rule touches
    // "span_mask" — verified with tools/benchkey.py)
    "span_mask" -> "s4",
    // r15 addition, the judge-granted wire key ("dedup"->"dd" has folded
    // suffix_dedup to suffix_dd by this point; no other registered name
    // contains that fragment — verified with tools/benchkey.py, all 178
    // pre-r15 keys byte-identical). Single-char because the 178-key model
    // sat at 1871/1880: a 1-char entry costs exactly the 9 remaining
    // chars, keeping the ToolSupportSpec bound with the driver's ~40-char
    // real edge behind it.
    "suffix_dd" -> "x")

  def benchKey(name: String): String =
    benchKeySubs.foldLeft(name.stripPrefix("q_")) {
      case (k, (a, b)) => k.replace(a, b)
    }

  /** Seconds → compact JSON number for the bench contract line: Locale.ROOT
    * (a comma decimal separator would corrupt the JSON), adaptive precision
    * (2dp under 1 s where granularity matters, 1dp above — per-query
    * medians don't carry more signal), trailing zeros stripped. Sign is
    * the CALLER's concern (Bench prepends "-" as its failure sentinel), so
    * the magnitude is returned. The precision ladder is part of the
    * 2000-char capture-window budget guarded in ToolSupportSpec. */
  def fmtSecs(v: Double): String = {
    val a = math.abs(v)
    val s = (if (a >= 1) "%.1f" else "%.2f")
      .formatLocal(java.util.Locale.ROOT, a)
    val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    if (t.isEmpty) "0" else t
  }
}
