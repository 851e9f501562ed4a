package graft

import graft.functions.{GraftExpressions, TextFunctions}
import graft.operators.{Dedup, EventOps, Multimodal, OmopDump, SequencePack, Similarity}
import graft.sources.{ParquetLayout, ParquetNoteSource, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract (see SURVEY.md §7): `queries` is the operator inventory,
  * `oracleSql` the DuckDB-equivalent of each query. Every query is written
  * to hash-match its oracle exactly:
  *  - integer outputs are cast to long on the Spark side (DuckDB counts/len
  *    are BIGINT) and aggregated integer sums are CAST(... AS BIGINT) on the
  *    DuckDB side (its SUM(BIGINT) widens to HUGEINT);
  *  - monetary sums go through DECIMAL(18,2) (order-independent) and return
  *    as double;
  *  - floating-point kernels (cosine, quality, LSH) use the same operation
  *    order on both sides so doubles agree bit-for-bit (see OracleFragments);
  *  - every result has a deterministic total order.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Output root for the dump queries (q50-q52): `GRAFT_TARGET_DIR` env /
    * `graft.target.dir` sysprop, else the JVM tmpdir — never an absolute
    * repo path, so the queries run from any checkout. Paths under it are
    * stable per (query, sf-dir) and every dump writes mode=overwrite, so
    * re-runs replace the previous output instead of accumulating
    * applicationId-suffixed directories.
    */
  private def dumpRoot: String =
    sys.env
      .get("GRAFT_TARGET_DIR")
      .orElse(sys.props.get("graft.target.dir"))
      .getOrElse(sys.props("java.io.tmpdir").stripSuffix("/") + "/graft-dumps")

  private def dumpPath(query: String, dir: String): String =
    s"$dumpRoot/${query}_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // De-identification tier (r11): the release step an OMOP dump feeds —
    // salted-hash pseudonyms that stay JOINABLE across tables (the gate
    // joins orders to customer ON the pseudonym), per-entity date
    // shifting, generalization + k-anonymity suppression, l-diversity.
    // All scan-side projections except the one quasi-key aggregate.
    "q159_pseudonymize" -> ((s, dir) => {
      val cust = graft.operators.Deidentify
        .pseudonymize(t(s, dir, "customer"), Map("c_custkey" -> "cust"), "r11")
      val ords = graft.operators.Deidentify
        .pseudonymize(t(s, dir, "orders"), Map("o_orderkey" -> "order", "o_custkey" -> "cust"), "r11")
      ords
        .join(cust, ords("o_custkey") === cust("c_custkey"))
        .groupBy(cust("c_custkey").as("p_cust"))
        .agg(count(lit(1)).as("n_orders"), min(ords("o_orderkey")).as("min_p_order"))
        .orderBy(col("p_cust"))
    }),
    "q160_date_shift" -> ((s, dir) => {
      graft.operators.Deidentify
        .dateShift(t(s, dir, "orders"), "o_orderdate", "o_custkey", 30, "r11")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey"))
    }),
    "q161_k_anonymize" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      graft.operators.Deidentify
        .suppressSmallGroups(g, Seq("c_nationkey", "bal_band"), 5L)
        .select(col("c_custkey"), col("c_nationkey"), col("bal_band"), col("suppressed"))
        .orderBy(col("c_custkey"))
    }),
    "q162_l_diversity" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      graft.operators.Deidentify
        .lDiversityAudit(g, Seq("c_nationkey", "c_mktsegment"), "bal_band", 3L)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),
    // C4-style blocklist audit: exact-token hits against a literal list,
    // scan-local, zero shuffle — the (in)famous badwords drop rule as an
    // auditable report rather than a silent filter
    "q163_blocklist" -> ((s, dir) => {
      graft.operators.Heuristics
        .blocklistReport(t(s, dir, "documents"), Seq("dup", "slow", "big"))
        .orderBy(col("doc_id"))
    }),
    // vocabulary-growth (Heaps-law) curve: distinct tokens first seen at
    // or before each id checkpoint + their token mass — one token-key
    // shuffle, per-token work bounded by |checkpoints|
    "q164_vocab_growth" -> ((s, dir) => {
      graft.operators.Report
        .vocabGrowth(t(s, dir, "documents"), Seq(100L, 200L, 300L, 400L, 500L))
        .orderBy(col("checkpoint"))
    }),
    // in-context-pretraining layout: pack whole documents within their
    // SEMANTIC group (here the embedding table's label; the production
    // composition joins Similarity.ivfIndex cells the same way) — related
    // docs share context windows instead of random hash buckets
    "q165_pack_grouped" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lab = t(s, dir, "embeddings").select(col("vec_id").as("doc_id"), col("label"))
      graft.operators.SequencePack
        .packGrouped(docs.join(lab, "doc_id"), "label", 256)
        .orderBy(col("doc_id"))
    }),
    // multi-word blocked phrases: overlapping k-token-window equality
    // per distinct phrase length, one split — C4's list blocks phrases
    // a token rule can't express without banning the words alone
    "q166_phrase_blocklist" -> ((s, dir) => {
      graft.operators.Heuristics
        .phraseBlocklistReport(
          t(s, dir, "documents"),
          Seq("table hash", "slow key", "customer join order")
        )
        .orderBy(col("doc_id"))
    }),
    // the COMPOSED de-identified release: date-shift (on the raw entity,
    // so the offset replays from the source key) -> pseudonymize both
    // keys -> write the release artifact -> gate on the READ-BACK (the
    // reference's extract-shard-verify discipline applied to the
    // de-identification output)
    "q167_deid_release" -> ((s, dir) => {
      val out = dumpPath("deid_q167", dir)
      val deid = graft.operators.Deidentify
        .pseudonymize(
          graft.operators.Deidentify
            .dateShift(t(s, dir, "orders"), "o_orderdate", "o_custkey", 30, "rel1"),
          Map("o_orderkey" -> "order", "o_custkey" -> "cust"),
          "rel1"
        )
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")
        )
      deid.coalesce(1).write.mode("overwrite").option("maxRecordsPerFile", 5000L).parquet(out)
      s.read.parquet(out).orderBy(col("o_orderkey"), col("o_custkey"))
    }),
    // HIPAA Safe-Harbor top-coding: clamp + flag at the cap — the ordered
    // analogue of cell suppression (the identifying tail collapses to one
    // category). Pure scan-side projection.
    "q168_top_code" -> ((s, dir) => {
      graft.operators.Deidentify
        .topCode(t(s, dir, "customer"), "c_acctbal", 9000L)
        .select(col("c_custkey"), col("c_acctbal"), col("top_coded"))
        .orderBy(col("c_custkey"))
    }),
    // k-anonymity SERVE path: a late slice judged against the RELEASE's
    // persisted census, not its own batch's (its own census would
    // suppress nearly everything) — the stateless stream-static half of
    // q161; census bounded by cell cardinality so the join broadcasts
    "q169_suppress_serve" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val census = graft.operators.Deidentify.cellCounts(g, Seq("c_nationkey", "bal_band"))
      graft.operators.Deidentify
        .suppressAgainstCounts(g.filter(col("c_custkey") <= 300L), census, Seq("c_nationkey", "bal_band"), 5L)
        .select(col("c_custkey"), col("c_nationkey"), col("bal_band"), col("suppressed"))
        .orderBy(col("c_custkey"))
    }),
    // the reference's EXACT shard naming (dump_table.py:157
    // `omop_notes.{N}.parquet`) — parallel write, then a driver-side
    // metadata rename pass; the gate fail-fasts on the template and
    // verifies shard sizes from parquet FOOTERS (the read-back
    // discipline), closing SURVEY §7's one documented layout trade
    "q170_dump_named" -> ((s, dir) => {
      val out = dumpPath("dump_q170", dir)
      val paths = graft.sources.ShardedParquetSink.writeNamed(
        t(s, dir, "customer").coalesce(1).sortWithinPartitions(col("c_custkey")),
        out,
        "omop_customer",
        graft.sources.ParquetLayout(maxRecordsPerFile = 400L)
      )
      paths.zipWithIndex.foreach { case (p, i) =>
        require(p.endsWith(s"omop_customer.$i.parquet"), s"bad shard name: $p")
      }
      val report = graft.sources.ShardedParquetSink.readBackReport(s, out)
      import s.implicits._
      report.shards.zipWithIndex
        .map { case (sh, i) => (i.toLong, sh.rows) }
        .toDF("shard_idx", "rows")
        .orderBy(col("shard_idx"))
    }),
    // re-identification risk across every non-empty quasi SUBSET (one
    // cube pass, subsets labeled by member names via grouping() flags)
    "q171_risk_audit" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      graft.operators.Deidentify
        .riskAudit(g, Seq("c_nationkey", "c_mktsegment", "bal_band"), 5L)
        .orderBy(col("subset"))
    }),
    // t-closeness audit: per quasi cell, exact-integer EMD between the
    // cell's ordered-sensitive CDF and the table's (l-diversity's blind
    // spot: diverse but SKEWED cells)
    "q172_t_closeness" -> ((s, dir) => {
      val bands = t(s, dir, "customer")
        .withColumn("bal_lo", (floor(col("c_acctbal") / 2000.0) * 2000).cast("long"))
      graft.operators.Deidentify
        .tClosenessAudit(bands, Seq("c_nationkey", "c_mktsegment"), "bal_lo", 50000L)
        .select(col("c_nationkey"), col("c_mktsegment"), col("cell_n"), col("emd_micro"), col("ok"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),
    // bucketized range join: clicks attributed to the 10-minute window
    // after each error — an equi-join on the time bucket (a raw theta
    // join would plan BNLJ/cartesian); exact predicate re-checked
    "q173_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("p"))
      val errors = ev.filter(col("event_type") === "error")
        .select(
          col("event_id").as("err_id"),
          unix_micros(col("ts").cast("timestamp")).as("w_start"),
          (unix_micros(col("ts").cast("timestamp")) + 600000000L).as("w_end")
        )
      graft.operators.RangeJoin
        .pointInInterval(clicks, errors, "p", "w_start", "w_end", 600000000L)
        .select(col("event_id"), col("err_id"))
        .orderBy(col("event_id"), col("err_id"))
    }),
    // interval-overlap join with the owner-bucket uniqueness rule (each
    // overlapping pair emitted exactly once, no distinct): error windows
    // overlapping purchase windows
    "q174_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(
          col("event_id").as("err_id"),
          unix_micros(col("ts").cast("timestamp")).as("e_start"),
          (unix_micros(col("ts").cast("timestamp")) + 600000000L).as("e_end")
        )
      val purch = ev.filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("pur_id"),
          unix_micros(col("ts").cast("timestamp")).as("p_start"),
          (unix_micros(col("ts").cast("timestamp")) + 300000000L).as("p_end")
        )
      graft.operators.RangeJoin
        .intervalOverlap(errs, purch, "e_start", "e_end", "p_start", "p_end", 600000000L)
        .select(col("err_id"), col("pur_id"))
        .orderBy(col("err_id"), col("pur_id"))
    }),
    // grid-snapped Mondrian k-anonymization: the PRODUCING half of the
    // privacy tier (the audits measure; this constructs the k-anonymous
    // generalization) — driver-iterated median cuts on band histograms,
    // no corpus-sized window in any round
    "q175_mondrian" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("a"),
        col("c_nationkey").cast("long").as("b")
      )
      graft.operators.Mondrian
        .anonymize(cust, Seq("a", "b"), 50L, 4)
        .select(
          col("c_custkey"), col("pid"), col("cell_n"),
          col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"), col("ok")
        )
        .orderBy(col("c_custkey"))
    }),
    // release-utility metrics over the q175 anonymization (the paper's
    // discernibility / class-size / certainty-penalty numbers, exact
    // integers over the partition-bounded box frame)
    "q176_mondrian_utility" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("a"),
        col("c_nationkey").cast("long").as("b")
      )
      val anon = graft.operators.Mondrian.anonymize(cust, Seq("a", "b"), 50L, 4)
      graft.operators.Mondrian.utilityReport(anon, Seq("a", "b"))
    }),
    // categorical t-closeness (TVD — the equal-distance EMD): the
    // market segment's distribution inside each nation cell vs globally
    "q177_t_closeness_cat" -> ((s, dir) => {
      graft.operators.Deidentify
        .tClosenessCategorical(t(s, dir, "customer"), Seq("c_nationkey"), "c_mktsegment", 80000L)
        .select(col("c_nationkey"), col("cell_n"), col("tvd_micro"), col("ok"))
        .orderBy(col("c_nationkey"))
    }),
    // the full k-ANONYMOUS release: Mondrian generalization -> raw quasi
    // columns DROPPED (only the partition's bounding box ships) ->
    // pseudonymized key -> the reference-template sharded write -> gate
    // on the READ-BACK — every privacy piece of the round composed into
    // the enclave-exit artifact
    "q178_k_release" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("a"),
        col("c_nationkey").cast("long").as("b")
      )
      val anon = graft.operators.Mondrian
        .anonymize(cust, Seq("a", "b"), 50L, 4)
        .select(col("c_custkey"), col("cell_n"), col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"))
      val release = graft.operators.Deidentify
        .pseudonymize(anon, Map("c_custkey" -> "cust"), "rel2")
        .withColumnRenamed("c_custkey", "p_cust")
      val out = dumpPath("krel_q178", dir)
      val paths = graft.sources.ShardedParquetSink.writeNamed(
        release.coalesce(1).sortWithinPartitions(col("p_cust")),
        out,
        "omop_release",
        graft.sources.ParquetLayout(maxRecordsPerFile = 600L)
      )
      paths.zipWithIndex.foreach { case (p, i) =>
        require(p.endsWith(s"omop_release.$i.parquet"), s"bad shard name: $p")
      }
      s.read.parquet(out).orderBy(col("p_cust"))
    }),
    // Safe Harbor's OTHER date rule: uniform truncation (no per-entity
    // secret; intervals destroyed) — per-month order counts survive
    "q179_date_truncate" -> ((s, dir) => {
      graft.operators.Deidentify
        .truncateDates(t(s, dir, "orders"), "o_orderdate", "month")
        .groupBy(col("o_orderdate").as("month"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("month"))
    }),
    // ε-differentially-private cell histogram — the aggregate-exit
    // release primitive completing the privacy tier (k-anon bounds a ROW
    // release; DP bounds what any released COUNT reveals about one
    // individual). Geometric mechanism, inverse-CDF from the salted hash
    // via an embedded LUT — deterministic, so the oracle replays it.
    "q180_dp_counts" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      graft.operators.Deidentify
        .dpCellCounts(g, Seq("c_nationkey", "bal_band"), 1000000L, "r13")
        .orderBy(col("c_nationkey"), col("bal_band"))
    }),
    // the COMPOSED DP release: banded histogram + ε=0.5 geometric noise,
    // template-sharded write, gated on the READ-BACK (the q167/q178
    // extract-shard-verify discipline applied to the DP artifact — the
    // noised counts are what leaves the enclave, so the noised counts are
    // what the gate reads back)
    "q181_dp_release" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val hist = graft.operators.Deidentify
        .dpCellCounts(g, Seq("c_mktsegment", "bal_band"), 500000L, "rel13")
      val out = dumpPath("dprel_q181", dir)
      val paths = graft.sources.ShardedParquetSink.writeNamed(
        hist.coalesce(1).sortWithinPartitions(col("c_mktsegment"), col("bal_band")),
        out,
        "omop_dp_hist",
        graft.sources.ParquetLayout(maxRecordsPerFile = 40L)
      )
      paths.zipWithIndex.foreach { case (p, i) =>
        require(p.endsWith(s"omop_dp_hist.$i.parquet"), s"bad shard name: $p")
      }
      s.read.parquet(out).orderBy(col("c_mktsegment"), col("bal_band"))
    }),
    // offset-checkpointed RE-ENTRANT dump — the reference's cursor loop
    // (dump_table.py:81-111) restarts from row zero on any failure; here
    // the key range is the checkpoint: per-chunk _SUCCESS markers make
    // re-entry skip complete ranges (the pushed filter keeps skipped
    // ranges off the wire). The gate runs fresh, CRASHES chunk 1 (marker
    // + data gone), resumes — requiring exactly that chunk to re-run —
    // then proves idempotent re-entry (nothing runs), and gates on the
    // read-back content == source (resume == fresh, value-transparent).
    "q182_resumable_dump" -> ((s, dir) => {
      val out = dumpPath("resume_q182", dir)
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val source = new graft.sources.ParquetNoteSource(s"$dir/customer.parquet")
      val b = source.scan(s).agg(min(col("c_custkey")), max(col("c_custkey"))).head()
      val bounds = (b.getAs[Number](0).longValue(), b.getAs[Number](1).longValue())
      def run() = graft.sources.ResumableDump.run(
        s, source, "c_custkey", bounds, out, 4,
        graft.sources.ParquetLayout(maxRecordsPerFile = 500L)
      )
      val fresh = run()
      require(fresh.ranChunks == (0 until 4) && fresh.skippedChunks.isEmpty, s"fresh: $fresh")
      // simulated mid-write crash of chunk 1: marker and data gone
      fs.delete(new org.apache.hadoop.fs.Path(s"$out/chunk_00001"), true)
      val resumed = run()
      require(resumed.ranChunks == Seq(1), s"resume must re-run ONLY chunk 1: $resumed")
      val idle = run()
      require(idle.ranChunks.isEmpty, s"idempotent re-entry must run nothing: $idle")
      graft.sources.ResumableDump.read(s, out).orderBy(col("c_custkey"))
    }),
    // closed-domain DP histogram: the support-leak fix — EVERY cell of
    // the public domain (here the observed-marginal product: nations ×
    // bands) gets a count (absent → 0) and its own draw, so an empty
    // cell is indistinguishable from a small one up to ε
    "q183_dp_closed_hist" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val domain = g.select(col("c_nationkey")).distinct()
        .crossJoin(g.select(col("bal_band")).distinct())
      graft.operators.Deidentify
        .dpClosedHistogram(g, domain, Seq("c_nationkey", "bal_band"), 1000000L, "r13h")
        .orderBy(col("c_nationkey"), col("bal_band"))
    }),
    // DP sums of a clipped contribution (sensitivity = clip, α = e^(−ε/Δ));
    // the noise key carries the value-column name, so these draws are
    // independent of q180's count draws over the same cells
    "q184_dp_sums" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
        .withColumn("orders_capped", pmod(col("c_custkey"), lit(13L)))
      graft.operators.Deidentify
        .dpCellSums(g, Seq("c_nationkey", "bal_band"), "orders_capped", 8L, 2000000L, "r13")
        .orderBy(col("c_nationkey"), col("bal_band"))
    }),
    // whole-CDM orchestration: one invocation dumps every table, keyed
    // tables resumable at chunk granularity, unkeyed dimensions guarded
    // whole; the gate runs the extraction TWICE and requires the second
    // pass to be all-skip (re-entrant), then compares per-table row
    // totals from the read-back footers against the source counts
    "q185_dump_all" -> ((s, dir) => {
      val root = dumpPath("dumpall_q185", dir)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      def specs = Seq(
        graft.sources.DumpAll.TableSpec(
          "customer", new graft.sources.ParquetNoteSource(s"$dir/customer.parquet"),
          keyCol = Some("c_custkey"), chunks = 4),
        graft.sources.DumpAll.TableSpec(
          "nation", new graft.sources.ParquetNoteSource(s"$dir/nation.parquet")),
        graft.sources.DumpAll.TableSpec(
          "region", new graft.sources.ParquetNoteSource(s"$dir/region.parquet"))
      )
      val fresh = graft.sources.DumpAll.run(s, specs, root)
      require(fresh.forall(_.ok) && fresh.map(_.ranChunks).sum > 0, s"fresh: $fresh")
      val again = graft.sources.DumpAll.run(s, specs, root)
      require(again.forall(o => o.ok && o.ranChunks == 0), s"re-entry must all-skip: $again")
      import s.implicits._
      again.map(o => (o.table, o.rows)).toDF("table_name", "n_rows").orderBy(col("table_name"))
    }),
    // USER-level DP histogram over a genuinely multi-row-per-individual
    // frame (orders: ~10 rows per customer): boundContributions caps each
    // customer at 3 rows per release (salted-hash ranked, replayable),
    // then the geometric mechanism runs at ε/cap per cell — the stated
    // ε=3.0 is a true user-level guarantee, which q180's unit-contribution
    // mechanism cannot give on this frame
    "q186_dp_user_counts" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "orders"), "o_totalprice", 100000L, "price_band")
      graft.operators.Deidentify
        .dpUserCellCounts(
          g, "o_custkey", "o_orderkey", Seq("o_orderstatus", "price_band"),
          maxRowsPerEntity = 3, epsilonMicro = 3000000L, salt = "r14")
        .orderBy(col("o_orderstatus"), col("price_band"))
    }),
    // the DP release LEDGER: one manifest row per released artifact
    // (ε, sensitivity, salt id, cell count, salt-free domain digest) with
    // the running ε total — the budget-composition table dpCellSums
    // documents as caller-owned, made auditable. Both releases cover the
    // SAME cell set, so their domain_hash agrees and the ledger shows
    // ε_count + ε_sum = 3.0 composing over one domain
    "q187_dp_ledger" -> ((s, dir) => {
      val quasi = Seq("c_nationkey", "bal_band")
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val rel1 = graft.operators.Deidentify.dpCellCounts(g, quasi, 1000000L, "r14a")
      val rel2 = graft.operators.Deidentify.dpCellSums(
        g.withColumn("orders_capped", pmod(col("c_custkey"), lit(13L))),
        quasi, "orders_capped", 8L, 2000000L, "r14b")
      graft.operators.Deidentify
        .dpLedger(Seq(
          graft.operators.Deidentify.dpManifest(rel1, quasi, "rel_a_counts", "count", 1000000L, 1L, "r14a"),
          graft.operators.Deidentify.dpManifest(rel2, quasi, "rel_b_sums", "sum", 2000000L, 8L, "r14b")
        ))
        .orderBy(col("release_id"))
    }),
    // user-level DP SUMS: clipping bounds one ROW's influence, the
    // contribution bound caps rows per individual — together one person
    // moves the sum vector by ≤ cap·clip in L1, so draws at ε/(cap·clip)
    // compose to the stated user-level ε=6.0
    "q188_dp_user_sums" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "orders"), "o_totalprice", 100000L, "price_band")
        .withColumn("qty", pmod(col("o_orderkey"), lit(9L)))
      graft.operators.Deidentify
        .dpUserCellSums(
          g, "o_custkey", "o_orderkey", Seq("o_orderstatus", "price_band"),
          "qty", clip = 5L, maxRowsPerEntity = 3, epsilonMicro = 6000000L, salt = "r14")
        .orderBy(col("o_orderstatus"), col("price_band"))
    }),
    // DP quantiles by POST-PROCESSING the released histogram: zero extra
    // privacy cost (post-processing invariance) and the already-audited
    // geometric mechanism stays the only noise source — the deliberate
    // trade against an exponential mechanism whose integer weight
    // quantization would silently relax the stated ε
    "q189_dp_quantiles" -> ((s, dir) => {
      val g = t(s, dir, "customer")
        .withColumn("bal_lo", (floor(col("c_acctbal") / 2000d) * 2000).cast("long"))
      val rel = graft.operators.Deidentify
        .dpCellCounts(g, Seq("c_mktsegment", "bal_lo"), 2000000L, "r14q")
      graft.operators.Deidentify
        .dpQuantiles(rel, Seq("c_mktsegment"), "bal_lo", Seq(250, 500, 750))
        .orderBy(col("c_mktsegment"), col("permille"))
    }),
    // DP means: the q187 ledger's two releases composed — mean = sum_dp /
    // n_dp is post-processing of two released artifacts, privacy cost
    // exactly ε_count + ε_sum = 3.0 (sequential composition, no new noise)
    "q190_dp_means" -> ((s, dir) => {
      val quasi = Seq("c_nationkey", "bal_band")
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val counts = graft.operators.Deidentify.dpCellCounts(g, quasi, 1000000L, "r14a")
      val sums = graft.operators.Deidentify.dpCellSums(
        g.withColumn("orders_capped", pmod(col("c_custkey"), lit(13L))),
        quasi, "orders_capped", 8L, 2000000L, "r14b")
      graft.operators.Deidentify
        .dpCellMeans(counts, sums, quasi)
        .orderBy(col("c_nationkey"), col("bal_band"))
    }),
    // DP top-k: the largest released cells — ranking an already-noised
    // histogram is post-processing (ε carries unchanged); deterministic
    // desc-count/asc-key order so the release replays exactly
    "q191_dp_topk" -> ((s, dir) => {
      val g = graft.operators.Deidentify
        .generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val rel = graft.operators.Deidentify
        .dpCellCounts(g, Seq("c_nationkey", "bal_band"), 1000000L, "r14a")
      graft.operators.Deidentify
        .dpTopK(rel, Seq("c_nationkey", "bal_band"), 10)
        .orderBy(col("rank"))
    }),
    // DP budget ENFORCEMENT (VERDICT r14 №5): the q187 ledger extended
    // with a third release over a DIFFERENT domain (orders cells), then
    // enforceBudget(cap = 3.0) — per-domain cumulative ε (customer domain
    // composes to exactly the cap, at-cap passes; orders 1.5) returned
    // alongside the global running total, the over-cap path raising at
    // execution (spec-gated in DeidentifySpec)
    "q192_dp_budget" -> ((s, dir) => {
      val D = graft.operators.Deidentify
      val quasiC = Seq("c_nationkey", "bal_band")
      val gc = D.generalize(t(s, dir, "customer"), "c_acctbal", 2000L, "bal_band")
      val relA = D.dpCellCounts(gc, quasiC, 1000000L, "r14a")
      val relB = D.dpCellSums(
        gc.withColumn("orders_capped", pmod(col("c_custkey"), lit(13L))),
        quasiC, "orders_capped", 8L, 2000000L, "r14b")
      val quasiO = Seq("o_orderstatus", "price_band")
      val go = D.generalize(t(s, dir, "orders"), "o_totalprice", 100000L, "price_band")
      val relC = D.dpCellCounts(go, quasiO, 1500000L, "r15c")
      D.enforceBudget(
        D.dpLedger(Seq(
          D.dpManifest(relA, quasiC, "rel_a_counts", "count", 1000000L, 1L, "r14a"),
          D.dpManifest(relB, quasiC, "rel_b_sums", "sum", 2000000L, 8L, "r14b"),
          D.dpManifest(relC, quasiO, "rel_c_orders", "count", 1500000L, 1L, "r15c")
        )),
        epsilonCapMicro = 3000000L
      ).orderBy(col("release_id"))
    }),
    // O2/O3/O4-class relational coverage --------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("n_rows"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          countDistinct(col("l_orderkey")).as("n_orders")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q03_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue")
        )
        .orderBy(col("r_name"), col("n_name"))
    }),
    "q04_window_topn" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),
    "q05_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q06_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def keys(status: String) =
        o.filter(col("o_orderstatus") === status).select(col("o_custkey")).distinct()
      keys("O").intersect(keys("F")).except(keys("P")).orderBy(col("o_custkey"))
    }),
    "q07_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_no_orders"))
        .orderBy(col("c_nationkey"))
    }),
    "q08_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderpriority"), 1, 3).as("pri_pfx"),
          floor(col("o_totalprice") / lit(1000.0)).cast("long").as("price_bucket"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag")
        )
        .orderBy(col("o_orderkey"))
    }),
    "q09_limit_count" -> ((s, dir) => {
      t(s, dir, "lineitem").limit(1234).agg(count(lit(1)).as("n"))
    }),
    "q10_table_counts" -> ((s, dir) => {
      val nl = t(s, dir, "lineitem").agg(count(lit(1)).as("n_lineitem"))
      val no = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
      val nc = t(s, dir, "customer").agg(count(lit(1)).as("n_customer"))
      nl.crossJoin(no).crossJoin(nc)
    }),
    // window frames, cube, correlated subquery, pivot ---------------------
    "q16_window_funcs" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_custkey") < 200)
      val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(
        col("o_custkey"),
        col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running).cast("double").as("run_total"),
        rank().over(byPrice).cast("long").as("price_rank")
      ).orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q17_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    // q18 goes through spark.sql ON PURPOSE: a correlated scalar subquery
    // exercises Catalyst's decorrelation (RewriteCorrelatedScalarSubquery),
    // which the DataFrame API can't express directly. The predicate is
    // price*n > sum (exact decimal) rather than price > avg to avoid
    // engine-specific AVG result types.
    "q18_correlated" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q18")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_q18 o
           WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
             (SELECT COUNT(*) FROM orders_q18 i WHERE i.o_custkey = o.o_custkey) >
             (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders_q18 i
              WHERE i.o_custkey = o.o_custkey) * 2
           ORDER BY o_orderkey"""
      )
    }),
    "q19_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .select(hour(col("ts")).cast("long").as("hr"), col("event_type"))
        .groupBy(col("hr"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("hr"))
    }),
    // events: json, event-time windows, sessions, as-of ------------------
    "q11_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    "q12_tumbling" -> ((s, dir) => {
      EventOps.tumbling(t(s, dir, "events"), "1 hour").orderBy(col("window_start"), col("event_type"))
    }),
    "q13_sliding" -> ((s, dir) => {
      EventOps.sliding(t(s, dir, "events"), "1 hour", "30 minutes").orderBy(col("window_start"))
    }),
    "q14_sessions" -> ((s, dir) => {
      EventOps.sessions(t(s, dir, "events"), "30 minutes").orderBy(col("user_id"), col("session_start"))
    }),
    "q15_asof_join" -> ((s, dir) => {
      EventOps.asofPurchaseSignup(t(s, dir, "events")).orderBy(col("event_id"))
    }),
    // documents: text analysis + dedup -----------------------------------
    "q20_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents")).orderBy(col("canonical_id"))
    }),
    // q21-q23 all read the fused one-pass TextStats kernel — five
    // interpreted passes (split + stopword HOF filters + two
    // regexp_extract_all) collapsed into one codegen'd scan per document;
    // formulas and oracles are unchanged.
    "q21_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextFunctions.stats(col("text")).as("st"))
        .select(col("lang"), col("st.n_tokens").as("n_tok"), col("st.n_distinct_tokens").as("n_dtok"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("n_dtok")).as("sum_distinct_tokens"),
          (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens")
        )
        .orderBy(col("lang"))
    }),
    "q22_quality" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.stats(col("text")).as("st"))
      val nTok = col("st.n_tokens")
      val stopRatio = col("st.hits_en").cast("double") / greatest(nTok, lit(1L)).cast("double")
      val lenScore = least(lit(1.0), nTok.cast("double") / lit(100.0))
      val stopScore = least(lit(1.0), stopRatio * lit(5.0))
      val punctRatio =
        col("st.n_punct").cast("double") / greatest(col("st.n_chars"), lit(1L)).cast("double")
      val punctScore = lit(1.0) - least(lit(1.0), punctRatio * lit(10.0))
      base
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          col("st.n_bpe").as("n_bpe"),
          col("st.n_punct").as("n_punct"),
          round(stopRatio, 6).as("stop_ratio"),
          round(
            (col("st.n_chars") - (nTok - lit(1L))).cast("double") / nTok.cast("double"),
            6
          ).as("avg_token_len"),
          round(lit(0.5) * lenScore + lit(0.3) * stopScore + lit(0.2) * punctScore, 6)
            .as("quality")
        )
        .orderBy(col("doc_id"))
    }),
    "q23_langid" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("lang"), TextFunctions.stats(col("text")).as("st"))
      val en = col("st.hits_en"); val de = col("st.hits_de")
      val fr = col("st.hits_fr"); val es = col("st.hits_es")
      val predicted = when(col("st.has_cjk"), lit("zh"))
        .when(en >= de && en >= fr && en >= es && en > 0, lit("en"))
        .when(de >= fr && de >= es && de > 0, lit("de"))
        .when(fr >= es && fr > 0, lit("fr"))
        .when(es > 0, lit("es"))
        .otherwise(lit("unknown"))
      base
        .select(predicted.as("predicted"), col("lang"))
        .groupBy(col("predicted"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("predicted") === col("lang"), 1L).otherwise(0L)).as("n_match")
        )
        .orderBy(col("predicted"))
    }),
    "q24_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    "q25_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(t(s, dir, "documents"), 0.8).orderBy(col("doc_a"), col("doc_b"))
    }),
    "q26_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), 0.5).orderBy(col("doc_a"), col("doc_b"))
    }),
    "q27_simhash" -> ((s, dir) => {
      Dedup.simhash(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "q39_simhash_weighted" -> ((s, dir) => {
      Dedup.simhashWeighted(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "q29_simhash_pairs" -> ((s, dir) => {
      // maxHamming 2: on the fixture every jaccard>=0.8 near-dup lands at
      // hamming 0-2 while the same-distribution noise floor starts at 2-3.
      // Pigeonhole banding is COMPLETE, so the oracle is the unrestricted
      // all-pairs hamming join — the gate verifies completeness itself.
      Dedup.simhashPairs(t(s, dir, "documents"), 2).orderBy(col("doc_a"), col("doc_b"))
    }),
    "q28_embedding_neardup" -> ((s, dir) => {
      Dedup.embeddingPairs(t(s, dir, "embeddings"), 0.4).orderBy(col("vec_a"), col("vec_b"))
    }),
    "q32_dedup_clusters" -> ((s, dir) => {
      Dedup.clusters(t(s, dir, "documents"), 0.8).orderBy(col("doc_id"))
    }),
    // same components, O(log n)-round algorithm — both formulations gated
    "q38_dedup_clusters_star" -> ((s, dir) => {
      Dedup.clustersScalable(t(s, dir, "documents"), 0.8).orderBy(col("doc_id"))
    }),
    // centrality-based cluster representative: 3 integer-exact damped
    // power-iteration rounds over the near-dup graph, keep = per-cluster
    // (cent desc, id) argmax — the canonical-version policy next to
    // min-id (q36) and best-quality (q42)
    "q121_dedup_central" -> ((s, dir) => {
      Dedup
        .dedupNearCentral(t(s, dir, "documents"), 0.8)
        .orderBy(col("doc_id"))
    }),
    "q36_dedup_near" -> ((s, dir) => {
      Dedup.dedupNear(t(s, dir, "documents"), 0.8).orderBy(col("doc_id"))
    }),
    // quality-aware dedup: keep each cluster's highest-quality member, not
    // its min-id member — one argmax aggregate over the clustering
    "q42_dedup_best" -> ((s, dir) => {
      Dedup.dedupNearBest(t(s, dir, "documents"), 0.8).orderBy(col("cluster_id"))
    }),
    // raw text -> hashing-trick embedding -> exact ANN, end to end: no
    // external model, every step deterministic and oracle-replayable
    "q43_text_embed_ann" -> ((s, dir) => {
      val emb = t(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), TextFunctions.embed(col("text"), 32).as("embedding"))
      Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 5).orderBy(col("query_id"), col("rnk"))
    }),
    // deterministic 20% content-hash sample: reproducible subsampling, per
    // lang counts pinned to the same modular predicate in DuckDB
    "q56_hash_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(TextFunctions.sampledBy(col("text"), 20))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),
    // incremental dedup: the 'val' split is the incoming delta, the
    // 'train' split the existing corpus — admit only delta docs with no
    // near-dup already ingested
    "q57_dedup_against" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val delta = docs.filter(TextFunctions.splitAssign(col("text"), 80) === "val")
      val corpus = docs.filter(TextFunctions.splitAssign(col("text"), 80) === "train")
      Dedup
        .dedupAgainst(delta, corpus, 0.8)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    // overlapping token-window chunking (context-window prep): 64-token
    // chunks, 8-token overlap, windows replayed identically in DuckDB
    "q58_chunking" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          posexplode(TextFunctions.chunks(col("text"), 64, 8)).as(Seq("chunk_idx", "chunk"))
        )
        .select(
          col("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"),
          size(split(col("chunk"), " ")).cast("long").as("n_tok")
        )
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    // data-quality gate: one-scan profile + referential-orphan count over
    // orders vs customer, every number pinned to plain SQL aggregates
    "q59_quality_checks" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val prof = graft.operators.QualityChecks
        .profile(orders, "o_orderkey", Seq("o_custkey", "o_orderdate"))
        .head()
      val orphans = graft.operators.QualityChecks
        .orphanCount(orders, customer, "o_custkey", "c_custkey")
      Seq(
        (
          prof.getAs[Long]("n_rows"),
          prof.getAs[Long]("n_distinct_key"),
          prof.getAs[Long]("n_null_o_custkey"),
          prof.getAs[Long]("n_null_o_orderdate"),
          orphans
        )
      ).toDF("n_rows", "n_distinct_key", "n_null_custkey", "n_null_orderdate", "n_orphans")
    }),
    // sequence packing: chunks -> fixed token-budget training sequences
    // (per-document running sum — parallel across docs, never a global sort)
    "q60_sequence_pack" -> ((s, dir) => {
      SequencePack
        .pack(t(s, dir, "documents"), budget = 96, chunkSize = 64, overlap = 8)
        .orderBy(col("doc_id"), col("seq_id"))
    }),
    // winnowed fingerprints (one-pass O(n) kernel), compared through
    // order-insensitive set digests (DuckDB list_distinct reorders)
    "q61_winnow" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFunctions.winnow(col("text"), Dedup.ShingleK, Dedup.WinnowW).as("fp")
        )
        .select(
          col("doc_id"),
          size(col("fp")).cast("long").as("n_fp"),
          array_min(col("fp")).as("fp_min"),
          array_max(col("fp")).as("fp_max"),
          aggregate(col("fp"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor")
        )
        .orderBy(col("doc_id"))
    }),
    // MOSS-style copy detection: pairs sharing >= 2 rare winnowed
    // fingerprints — catches copied RUNS that whole-doc Jaccard misses
    "q62_copy_pairs" -> ((s, dir) => {
      Dedup
        .winnowedPairs(t(s, dir, "documents"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // cross-document packing: fill 256-token training rows from whole
    // docs, greedy within content-hash buckets whose COUNT is derived
    // from the corpus size (~64 docs/bucket here so the derivation is
    // exercised at fixture scale) — per-bucket sort stays bounded at any
    // corpus size instead of growing with it
    "q64_pack_across" -> ((s, dir) => {
      SequencePack
        .packAcrossAuto(t(s, dir, "documents"), budget = 256, targetDocsPerBucket = 64)
        .groupBy(col("bucket"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("bucket"), col("seq_id"))
    }),
    // the COMPOSED training-data pipeline: scrub -> quality gate -> exact
    // dedup -> near dedup (best-quality rep) -> balanced per-lang sample
    // -> chunk -> pack. Every stage is gated individually (q22/q20/q42/
    // q63/q58/q60); this gates their COMPOSITION — the inter-stage column
    // contracts and cache scopes a real corpus build exercises
    "q65_training_pipeline" -> ((s, dir) => {
      graft.operators.Pipeline
        .trainingData(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("seq_id"))
    }),
    // benchmark decontamination: content-hash split into corpus (80%) vs
    // benchmark (20%); every corpus doc sharing an exact 4-gram with the
    // benchmark reports its distinct shared-gram count. The benchmark
    // n-gram index broadcasts; the corpus is never shuffled on gram
    "q66_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Decontaminate
        .overlapReport(docs.filter(bucket < 8), docs.filter(bucket >= 8), k = 4)
        .orderBy(col("doc_id"))
    }),
    // semantic decontamination: max cosine of every corpus vector
    // against the broadcast benchmark slice — the embedding-space tier
    // that catches paraphrases n-grams can't; flag at cos >= 0.8
    "q146_semantic_decon" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Decontaminate
        .semanticOverlap(
          emb.filter(col("vec_id") % 10 =!= 9),
          emb.filter(col("vec_id") % 10 === 9),
          800000L
        )
        .orderBy(col("vec_id"))
    }),
    // banded semantic decon for corpus-sized benchmarks: candidates from
    // the LSH bucket equi-join (both sides corpus-sized, no broadcast),
    // one-sided the OTHER way — can miss, never false-flag
    "q147_semantic_decon_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Decontaminate
        .semanticOverlapLsh(
          emb.filter(col("vec_id") % 10 =!= 9),
          emb.filter(col("vec_id") % 10 === 9),
          800000L
        )
        .orderBy(col("vec_id"))
    }),
    // language identification: per-language char-trigram rarity profiles
    // trained on the labeled even-id slice, odd-id docs assigned argmin
    // mean rarity — alphabet-bounded broadcast models, min(struct) argmin
    "q148_lang_id" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // the operator's documented serve contract: persist the
      // alphabet-bounded model once — scoring joins grams AND prefixes,
      // and each broadcast build would otherwise recompute the training
      // explode+aggregate chain from scratch
      val model = graft.operators.LangId.persistModel(
        graft.operators.LangId.train(docs.filter(col("doc_id") % 2 === 0))
      )
      graft.operators.LangId
        .assign(docs.filter(col("doc_id") % 2 === 1), model)
        .orderBy(col("doc_id"))
    }),
    // the composition langid exists for: the corpus card over a DERIVED
    // lang column — predictions replace the assumed label, the card's
    // single-scan rollup rides unchanged
    "q149_lang_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.LangId.persistModel(
        graft.operators.LangId.train(docs.filter(col("doc_id") % 2 === 0))
      )
      graft.operators.LangId.corpusCardDerived(docs, model).orderBy(col("source"))
    }),
    // learned quality classifier: NB count-ratio weights over hashed
    // unigram features trained on labeled mod-3 slices (pos=0, neg=1),
    // the held-out remainder scored by mean bucket weight — the model is
    // exactly numBuckets rows, complete and broadcast
    "q150_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Classifier.train(
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 === 1)
      )
      graft.operators.Classifier
        .score(docs.filter(col("doc_id") % 3 === 2), model)
        .orderBy(col("doc_id"))
    }),
    // embedding JOIN: every left vector's ranked top-5 right vectors —
    // corpus x corpus (no broadcast side), candidates from the exact
    // (table, bucket) LSH equi-join, q147's banding generalized from a
    // max-flag to ranked top-k; per-left top-k via the bounded heap
    "q158_ann_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity
        .annJoin(
          emb.filter(col("vec_id") % 10 =!= 9),
          emb.filter(col("vec_id") % 10 === 9),
          5
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    // packed windows WITH doc-boundary metadata: the q131 layout plus
    // per-window doc_starts — the separator table behind block-diagonal
    // attention masks / position-id resets in packed pretraining; same
    // plan, the boundary rides the reassembly aggregate
    "q155_pack_boundaries" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
      val enc = graft.operators.Vocabulary
        .encodeSubwords(docs, segs, graft.operators.Vocabulary.subwordVocab(segs))
      graft.operators.SequencePack
        .chunkIdsAcrossWithBoundaries(enc, 64, Some(-1L), buckets = 32)
        .select(col("chunk_idx"), col("n_ids"), explode_outer(col("doc_starts")).as("start_pos"))
        .orderBy(col("chunk_idx"), col("start_pos").asc_nulls_first)
    }),
    // epoch-based source upsampling: the Pile/LLaMA mixture table's
    // other half — floor(e) whole copies + one fractional copy via the
    // salted content-hash draw; pure scan-side explode, no shuffle
    "q156_epoch_expand" -> ((s, dir) => {
      val epochs = (0 until 20)
        .map(i => s"src$i" -> Seq(400L, 1000L, 1700L, 2300L)(i % 4))
        .toMap
      graft.operators.Sampling
        .epochExpand(t(s, dir, "documents"), "source", epochs, "text")
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),
    // tokenizer drift: diff the 6-merge and 8-merge BPE segmentation
    // artifacts (prefix-stable trainer — the 6-round run IS the 8-round
    // run's s6 table, which is how the oracle replays both from ONE
    // chain); the corpus-weighted answer to "what re-tokenizes"
    "q157_tokenizer_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Vocabulary
        .segmentationDiff(
          graft.operators.Vocabulary.bpeSegmentations(docs, 6),
          graft.operators.Vocabulary.bpeSegmentations(docs, 8)
        )
        .orderBy(col("w"))
    }),
    // unigram-LM (SentencePiece-style) tokenizer trainer: seed-substring
    // inventory -> Viterbi segmentation under double-product scores in
    // fixed fold order -> count re-estimation + prune -> final piece
    // table; the third trainer next to BPE (q100) and WordPiece (q111)
    "q152_unigram_pieces" -> ((s, dir) => {
      graft.operators.Vocabulary
        .unigramPieces(t(s, dir, "documents"), seedSize = 48, targetSize = 24, maxPieceLen = 4, wordLenCap = 12)
        .orderBy(col("piece"))
    }),
    // the unigram serving profile: per-doc word/subword counts through
    // the SAME broadcast-lookup layer as BPE serving (q101) — the
    // segmentation table is the artifact, encoding never re-runs Viterbi
    "q153_unigram_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary
        .unigramSegmentations(docs, seedSize = 48, targetSize = 24, maxPieceLen = 4, wordLenCap = 12)
      graft.operators.Vocabulary.bpeProfile(docs, segs).orderBy(col("doc_id"))
    }),
    // the calibrated filter the classifier feeds: keep the top 30% of
    // every source by LEARNED score through the q145 from-above rule
    "q151_keep_top_learned" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Classifier.train(
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 === 1)
      )
      graft.operators.Classifier
        .keepTopLearned(docs, model, 300L)
        .select(col("doc_id"), col("source"), col("q_micro"), col("pct_micro"))
        .orderBy(col("doc_id"))
    }),
    // memorization-length audit: per corpus doc, the longest contiguous
    // token span whose every 4-gram appears in the benchmark set — the
    // number extraction curves are plotted against (ten scattered grams
    // vs one verbatim quote read the same in q66, differently here);
    // broadcast gram index + per-doc gaps-and-islands window
    "q154_memorization" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Decontaminate
        .memorizationProfile(docs.filter(bucket < 8), docs.filter(bucket >= 8), k = 4)
        .orderBy(col("doc_id"))
    }),
    // Bloom-filter decontamination: the benchmark's gram set folded into
    // a FIXED bits/32-word array (footprint independent of benchmark
    // size — the 100-TB broadcast shape), corpus grams probe 3 affine
    // bits each; one-sided error so n_maybe superset-bounds q66's exact
    // counts, every bit DuckDB-pinned
    "q135_bloom_decon" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      val bloom = graft.operators.Decontaminate
        .bloomIndex(docs.filter(bucket >= 8), bits = 32768L, nHashes = 3, k = 4)
      graft.operators.Decontaminate
        .bloomReport(docs.filter(bucket < 8), bloom, bits = 32768L, nHashes = 3, k = 4)
        .orderBy(col("doc_id"))
    }),
    // Gopher-style within-document repetition: duplicate-2-gram and
    // top-2-gram occupancy fractions — the degenerate-text signals the
    // length/stopword quality score cannot see
    "q67_repetition" -> ((s, dir) => {
      graft.operators.Repetition
        .gramStats(t(s, dir, "documents"), n = 2)
        .orderBy(col("doc_id"))
    }),
    // KMV distinct-count sketch per source (k=8 so the estimation path
    // fires at fixture scale), joined to the exact distinct count it
    // approximates so the estimate's accuracy is part of the gated result
    "q68_kmv_distinct" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Sketch
        .kmvDistinct(docs, "source", "text", k = 8)
        .join(
          docs.groupBy(col("source")).agg(countDistinct(col("text")).as("n_exact")),
          Seq("source")
        )
        .orderBy(col("source"))
    }),
    // C4-style segment dedup: every non-first occurrence of a repeated
    // 5-token segment removed corpus-wide, documents reassembled from
    // their surviving segments — the boilerplate remover
    "q70_segment_dedup" -> ((s, dir) => {
      graft.operators.SegmentDedup
        .dedupSegments(t(s, dir, "documents"), segTokens = 5)
        .orderBy(col("doc_id"))
    }),
    // boilerplate removal: segments in > maxDf distinct docs cut
    // EVERYWHERE (q70 keeps the first occurrence; a million-page banner
    // deserves zero) — the RefinedWeb/Dolma line-dedup rule
    "q91_boilerplate_segments" -> ((s, dir) => {
      graft.operators.SegmentDedup
        .dropBoilerplateSegments(t(s, dir, "documents"), segTokens = 5, maxDf = 2L)
        .orderBy(col("doc_id"))
    }),
    // JSONL export round-trip: sharded gzip JSON-Lines write (the LLM
    // corpus interchange format), schema-pinned FAILFAST read-back; the
    // gate hashes the text content across the round trip, so JSON
    // escaping must be lossless, and pins the shard split arithmetic
    "q72_jsonl_roundtrip" -> ((s, dir) => {
      val out = dumpPath("jsonl_q72", dir)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .coalesce(1) // single writer task -> shard count is pure arithmetic
      graft.sources.JsonlSink.write(
        docs,
        out,
        graft.sources.JsonlLayout(maxRecordsPerFile = 100L)
      )
      val back =
        graft.sources.JsonlSink.read(s, out, "doc_id BIGINT, lang STRING, text STRING")
      import s.implicits._
      val digest = back
        .select(col("doc_id"), GraftExpressions.poly_hash(col("text")).as("ph"))
        .agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("doc_id")).as("n_ids"),
          expr("bit_xor(ph)").as("content_xor")
        )
      digest.crossJoin(
        Seq(graft.sources.JsonlSink.shardCount(s, out)).toDF("n_files")
      )
    }),
    // KMV corpus-overlap estimate between two document sets (60% / 70%
    // content-hash slices with a 30% true overlap) — sketch composition,
    // never a corpus-vs-corpus join; short-circuits to exact below k
    "q73_corpus_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Sketch.corpusOverlap(
        docs.filter(bucket < 6),
        docs.filter(bucket >= 3),
        "text",
        k = 64
      )
    }),
    // PII exposure audit: what scrub would redact, counted per language
    // before any text is rewritten — one codegen'd scan
    "q74_pii_report" -> ((s, dir) => {
      graft.operators.QualityChecks
        .piiReport(t(s, dir, "documents"))
        .orderBy(col("lang"))
    }),
    // SemDeDup: k-means cells over the embedding space, exact cosine
    // pairs within each cell, connected components, min-id representative
    // — the semantic-pruning step of a curation pipeline. r07: the gated
    // plan is the PRODUCTION shape — codebook trained on the 1-in-2 id
    // sample (q84's trainer discipline), which divides the pinned
    // variant's quadratic-family n·C terms by `every` while the in-cell
    // pair stage stays occupancy-bounded
    "q71_semdedup" -> ((s, dir) => {
      Similarity
        .semDedupSampled(t(s, dir, "embeddings"), 0.4, every = 2)
        .orderBy(col("vec_id"))
    }),
    // SemDeDup at the other end of the flat-quantizer trade: sqrt(n/2)
    // cells, in-cell pairs distributed by the q28 triangle blocking —
    // assignment and pair work balance at n^1.5 (the 100 TB default)
    "q85_semdedup_balanced" -> ((s, dir) => {
      Similarity
        .semDedupBalanced(t(s, dir, "embeddings"), 0.4)
        .orderBy(col("vec_id"))
    }),
    // weighted mixture sampling: per-language keep rates applied through
    // the content hash — scan-only, reproducible, dedup-consistent
    "q69_weighted_mix" -> ((s, dir) => {
      graft.operators.Sampling
        .weightedBy(
          t(s, dir, "documents"),
          "lang",
          Map("en" -> 0.5, "de" -> 0.75, "fr" -> 1.0, "es" -> 0.2),
          "text",
          defaultRate = 0.1
        )
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),
    // CCNet-style LM quality scoring: bigram model trained on the 80%
    // content-hash slice, the held-out 20% scored by integer-scaled
    // inverse smoothed probability — the distributional fluency signal
    // the length/stopword score and repetition stats cannot see
    "q75_lm_rarity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      val model = graft.operators.NgramLM.train(docs.filter(bucket < 8))
      graft.operators.NgramLM
        .score(docs.filter(bucket >= 8), model)
        .orderBy(col("doc_id"))
    }),
    // CCNet head/middle/tail perplexity buckets over the q75 scorer:
    // terciles derived from a 1-in-4 id-hash SAMPLE (the window sorts
    // sample values, never the corpus), thresholds broadcast back,
    // assignment scan-side
    "q90_rarity_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      val model = graft.operators.NgramLM.train(docs.filter(bucket < 8))
      graft.operators.NgramLM
        .rarityBuckets(docs.filter(bucket >= 8), model, sampleMod = 4)
        .orderBy(col("doc_id"))
    }),
    // DSIR-style importance scoring: hashed-unigram bucket weights
    // trained target-vs-raw (en vs the rest), raw docs scored by mean
    // smoothed count ratio — bounded 4096-bucket model, always broadcast
    "q92_dsir_importance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val weights = graft.operators.Importance.train(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en")
      )
      graft.operators.Importance
        .score(docs.filter(col("lang") =!= "en"), weights)
        .orderBy(col("doc_id"))
    }),
    // per-source token-budget cap: content-hash-ordered prefix per
    // source until the running token total crosses the budget — the
    // Dolma/Pile mixing primitive; two-phase bucketed prefix sum, no
    // whole-source sort
    "q93_token_budget" -> ((s, dir) => {
      graft.operators.Sampling
        .capTokenBudget(t(s, dir, "documents"), budgetTokens = 800L)
        .orderBy(col("doc_id"))
    }),
    // the HYGIENE-composed pipeline: scrub -> structural Gopher gate ->
    // quality -> repetition filter -> decontaminate -> exact+near dedup
    // -> temperature mix -> chunk+pack, eight stages end to end (q82
    // gates the composition; each stage is gated alone by
    // q22/q88/q67/q66/q20/q42/q78/q60)
    "q82_hygienic_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Pipeline
        .hygienicTrainingData(docs.filter(bucket < 9), docs.filter(bucket >= 9))
        .orderBy(col("doc_id"), col("seq_id"))
    }),
    // attrition funnel over the q82 chain: one row per hygiene stage
    // (n_in, n_dropped, n_out) — derived from rejectReasons' per-doc
    // attribution in ONE groupBy(reason) action (the r14 one-pass
    // rework; the old shape counted all 8 boundaries sequentially)
    "q109_attrition" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Pipeline
        .attrition(docs.filter(bucket < 9), docs.filter(bucket >= 9))
        .orderBy(col("stage_idx"))
    }),
    // curriculum shard plan: content-hash shard placement (each shard an
    // unbiased corpus sample) with WITHIN-shard order ranked by token
    // count — the sequence-length-warmup curriculum; same one-exchange +
    // per-shard-sort plan as q89
    "q98_curriculum_plan" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Sampling
        .curriculumPlan(
          docs.select(
            col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tok")
          ),
          nShards = 8,
          scoreCol = "n_tok",
          seed = 42L
        )
        .orderBy(col("doc_id"))
    }),
    // the MATERIALIZED mixing pipeline: q94's plan written as one
    // position-sorted parquet file per shard and READ BACK — the gate
    // compares what landed on disk, closing the O9-O11 circle over the
    // mixing tail
    "q97_mix_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Pipeline
        .writeMixed(
          docs.filter(bucket < 9),
          docs.filter(bucket >= 9),
          budgetTokens = 300L,
          nShards = 8,
          outputDir = dumpPath("mix_q97", dir),
          seed = 42L
        )
        .orderBy(col("doc_id"))
    }),
    // BPE merge training: 8 rounds of most-frequent-adjacent-pair fusion
    // over the word-frequency table (corpus read once; the loop runs on
    // distinct words) — the tokenizer-prep step after q81's raw vocab
    "q100_bpe_merges" -> ((s, dir) => {
      graft.operators.Vocabulary
        .bpeMerges(t(s, dir, "documents"), nMerges = 8)
        .orderBy(col("merge_idx"))
    }),
    // BPE serving: per-doc word/subword counts via the broadcast
    // segmentation table the trainer already computed — encoding is a
    // dictionary lookup, never a per-document merge-loop re-run
    "q101_bpe_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
      graft.operators.Vocabulary.bpeProfile(docs, segs).orderBy(col("doc_id"))
    }),
    // tokenizer serving end-to-end: trained segmentations + the
    // mass-ranked symbol-id vocabulary -> each document's subword-id
    // sequence (the artifact a training pipeline actually emits); two
    // broadcast lookups, order reassembled from (word pos, sym pos),
    // corpus unshuffled until the per-doc assembly. Gate flattens the
    // ids array to scalar (doc_id, pos, sym_id) rows for the compare.
    "q127_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
      val vocab = graft.operators.Vocabulary.subwordVocab(segs)
      graft.operators.Vocabulary
        .encodeSubwords(docs, segs, vocab)
        .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "sym_id")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("sym_id"))
        .orderBy(col("doc_id"), col("pos"))
    }),
    // the final hop of text -> model input: encoded id sequences split
    // into fixed-length (64) training windows, document-nested, partial
    // tail kept — row-local slice arithmetic, no shuffle beyond encode;
    // gate flattens to (doc_id, chunk_idx, pos, sym_id)
    "q130_pack_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
      val enc = graft.operators.Vocabulary
        .encodeSubwords(docs, segs, graft.operators.Vocabulary.subwordVocab(segs))
      graft.operators.SequencePack
        .chunkIds(enc, 64)
        .select(
          col("doc_id"),
          col("chunk_idx"),
          posexplode(col("ids")).as(Seq("pos", "sym_id"))
        )
        .select(col("doc_id"), col("chunk_idx"), col("pos").cast("long").as("pos"), col("sym_id"))
        .orderBy(col("doc_id"), col("chunk_idx"), col("pos"))
    }),
    // the GPT-style pretraining layout: encoded docs + EOS sentinel
    // concatenated into one global stream, split into fixed-64 windows
    // CROSSING document boundaries — offsets via the bucketed prefix
    // sum (no corpus-wide sort), windows reassembled from row-local
    // pieces by one chunk_idx shuffle; gate flattens the windows
    "q131_pack_across" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
      val enc = graft.operators.Vocabulary
        .encodeSubwords(docs, segs, graft.operators.Vocabulary.subwordVocab(segs))
      graft.operators.SequencePack
        .chunkIdsAcross(enc, 64, Some(-1L), buckets = 32)
        .select(
          col("chunk_idx"),
          posexplode(col("ids")).as(Seq("pos", "sym_id"))
        )
        .select(col("chunk_idx"), col("pos").cast("long").as("pos"), col("sym_id"))
        .orderBy(col("chunk_idx"), col("pos"))
    }),
    // Count-Min sketch: the depth×width counter grid built in one pass
    // (partial aggregation collapses partitions to ≤ grid cells before
    // the shuffle), then a point estimate — min over the key's depth
    // counters — for every distinct key; est >= exact always, the grid
    // bounds every exchange, and the minhash-family row hashes make each
    // counter DuckDB-pinnable. Keys are positional BIGRAMS (~900 on the
    // fixture) against width 256, so the sketch genuinely collides and
    // the gate pins the collision arithmetic, not just clean counters
    "q132_cms_counts" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(
          explode(graft.functions.TextFunctions.positionalShingles(col("text"), 2)).as("tok")
        )
      val sketch = graft.operators.Sketch.cmsSketch(grams, "tok", depth = 4, width = 256)
      graft.operators.Sketch
        .cmsEstimate(sketch, grams.select("tok").distinct(), "tok", depth = 4, width = 256)
        .orderBy(col("tok"))
    }),
    // ranking-quality metrics: LSH ANN evaluated against the exact
    // brute-force truth — recall@10 per query as integer fixed-point
    // (prec/rec milli, RR/AP micro), the evaluation operator every
    // ranked tier shares; all frames co-keyed on query_id, windows
    // bounded by k
    "q133_rank_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      graft.operators.Retrieval
        .rankMetrics(
          Similarity.annLsh(emb, qids, 10),
          Similarity.bruteForceTopK(emb, qids, 10),
          10
        )
        .orderBy(col("query_id"))
    }),
    // the WordPiece RUNTIME: greedy longest-match segmentation against
    // the trainer's symbol inventory (BERT's serving algorithm — ships
    // the inventory, not the merges), composed through the same encode
    // layer as q127; word-table-bounded steps + driver-iterated walk
    "q134_wp_greedy_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.operators.Vocabulary
        .subwordVocab(graft.operators.Vocabulary.wordpieceSegmentations(docs, 8))
      val greedy = graft.operators.Vocabulary.greedySegmentations(docs, vocab, 16)
      graft.operators.Vocabulary
        .encodeSubwords(docs, greedy, vocab)
        .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "sym_id")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("sym_id"))
        .orderBy(col("doc_id"), col("pos"))
    }),
    // the calibrated filter: top 30% of EVERY source by fused quality —
    // no source wiped out or waved through by a global threshold
    "q145_keep_top_quality" -> ((s, dir) => {
      graft.operators.Report
        .keepTopQuality(t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")), 300L)
        .select(col("doc_id"), col("source"), col("score_micro"), col("pct_micro"))
        .orderBy(col("doc_id"))
    }),
    // per-source percentile calibration of the quality score: the step
    // before any cross-source threshold — the histogram window orders
    // distinct VALUES per source, documents rank back via one co-keyed
    // join; "top 30% of every source" becomes a single comparison
    "q144_quality_pct" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(
          col("doc_id"),
          col("source"),
          TextFunctions.qualityScoreFused(col("text")).as("q")
        )
        .select(
          col("doc_id"),
          col("source"),
          expr("CAST(floor(q * 1000000 + 0.5) AS BIGINT)").as("score_micro")
        )
      graft.operators.Report
        .percentileRanks(scored, "score_micro")
        .orderBy(col("doc_id"))
    }),
    // cross-source duplication matrix on the 4-token prefix fingerprint:
    // which sources share openings — per-hash pairing bounded by the
    // SOURCE count, duplicates within one source collapse before pairing
    "q143_source_overlap" -> ((s, dir) => {
      graft.operators.Report
        .sourceOverlap(t(s, dir, "documents"), prefixTokens = 4)
        .orderBy(col("src_a"), col("src_b"))
    }),
    // per-source corpus card: one scan into a (source, lang) aggregate,
    // bounded rollup, min_by top-lang tie-break, dup mass over 8-byte
    // content hashes — the datasheet composition table
    "q112_corpus_card" -> ((s, dir) => {
      graft.operators.Report
        .corpusCard(t(s, dir, "documents"))
        .orderBy(col("source"))
    }),
    // snapshot diff between two corpus versions (content-hash full outer
    // join on the id — text never crosses the wire): snapshots derived
    // deterministically from the fixture (mod-7 removals, mod-5
    // additions, mod-3 revisions)
    "q113_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs
        .filter(col("doc_id") % 5 =!= 0)
        .withColumn(
          "text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" rev")))
            .otherwise(col("text"))
        )
      graft.operators.Report.snapshotDiff(oldSnap, newSnap).orderBy(col("doc_id"))
    }),
    // collocation mining: adjacent pairs ranked by integer-rational LIFT
    // (the log-free monotone core of PMI) — one pass, two vocab-bounded
    // aggregates, broadcast unigram joins, TakeOrdered top-k
    "q120_collocations" -> ((s, dir) => {
      graft.operators.Vocabulary
        .collocations(t(s, dir, "documents"), k = 30, minCount = 5)
        .orderBy(col("lift_micro").desc, col("l"), col("r"))
    }),
    // WordPiece trainer: the BPE round structure with the likelihood
    // argmax (pair / (left * right) in fixed double-division order) —
    // per-round symbol counts are one extra aggregate on the word table
    "q111_wordpiece_merges" -> ((s, dir) => {
      graft.operators.Vocabulary
        .wordpieceMerges(t(s, dir, "documents"), nMerges = 8)
        .orderBy(col("merge_idx"))
    }),
    // exact heavy hitters (freq > n/64) via the two-pass Misra-Gries
    // sketch-then-recount: pass 1 reduces each partition to <= 64
    // counters before a single-row exchange, pass 2 recounts only the
    // candidates — the corpus token stream never shuffles on its own key
    "q102_heavy_hitters" -> ((s, dir) => {
      graft.operators.HeavyHitters
        .heavyHitters(t(s, dir, "documents"), "text", k = 64)
    }),
    // BM25 ranked retrieval in the all-integer scoring discipline: the
    // isin(query) filter runs before the tf aggregate (only query-term
    // occurrences shuffle), the <= |Q|-row model broadcasts back, and
    // the top-k is a TakeOrdered — no global sort, no corpus-keyed join
    "q103_bm25" -> ((s, dir) => {
      graft.operators.Retrieval
        .bm25TopK(t(s, dir, "documents"), "text", Seq("dup", "vector", "merge"), 10)
        .orderBy(col("rnk"))
    }),
    // hard-negative mining (DPR/Contriever): per query the top-k most
    // similar candidates BELOW the near-dup threshold — near-dups are
    // false negatives for a contrastive loss, so they are excluded by
    // the same cosine the ranking uses. Exact variant gated; the
    // cell-pruned hardNegativesIvf twin is recall-gated in AnnRecallSpec
    "q104_hard_negatives" -> ((s, dir) => {
      Similarity
        .hardNegatives(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10, maxCos = 0.3)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ORC interchange roundtrip (q72's digest gate over the other
    // columnar envelope): write sharded ORC, read back, digest content
    "q105_orc_roundtrip" -> ((s, dir) => {
      val out = dumpPath("orc_q105", dir)
      // parallel writers WITH pure shard arithmetic (r18, VERDICT r17 №2):
      // the old coalesce(1) serialized all ~n/100 file creates in ONE
      // task, so the gate measured the host's per-file-create latency
      // era ×50 — the named mechanism behind the q105 flag history (a
      // parquet write of the same frame costs the same; Profile fileio).
      // parallel writers with the shard count still pure arithmetic:
      // see [[graft.sources.BlockShard]] — exact-100-row blocks over the
      // (loudly required) contiguous doc_id space, range-partitioned
      // across 10 writers; the old coalesce(1) serialized all ~n/100
      // file creates in one task, making the gate measure the host's
      // per-file-create latency era ×50 (Profile fileio named it: a
      // parquet write of the same frame costs the same — the format was
      // never the problem). The digest is placement-invariant.
      val docs = graft.sources.BlockShard(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        "doc_id", rowsPerFile = 100L, writers = 10)
      graft.sources.OrcSink.write(docs, out, maxRecordsPerFile = 100L)
      val back = graft.sources.OrcSink
        .read(s, out, Some("doc_id BIGINT, lang STRING, text STRING"))
      import s.implicits._
      back
        .select(col("doc_id"), GraftExpressions.poly_hash(col("text")).as("ph"))
        .agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("doc_id")).as("n_ids"),
          expr("bit_xor(ph)").as("content_xor")
        )
        .crossJoin(Seq(graft.sources.OrcSink.shardCount(s, out)).toDF("n_files"))
    }),
    // CSV interchange roundtrip: quoted-and-escaped export, schema-pinned
    // FAILFAST read-back, same content digest — the escaping path is the
    // part of CSV that silently corrupts when wrong
    "q106_csv_roundtrip" -> ((s, dir) => {
      val out = dumpPath("csv_q106", dir)
      // same parallel block-sharded write as q105 (shard count stays
      // pure arithmetic; see the q105 note + [[graft.sources.BlockShard]])
      val docs = graft.sources.BlockShard(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        "doc_id", rowsPerFile = 100L, writers = 10)
      graft.sources.CsvSink.write(docs, out, maxRecordsPerFile = 100L)
      val back = graft.sources.CsvSink
        .read(s, out, "doc_id BIGINT, lang STRING, text STRING")
      import s.implicits._
      back
        .select(col("doc_id"), GraftExpressions.poly_hash(col("text")).as("ph"))
        .agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("doc_id")).as("n_ids"),
          expr("bit_xor(ph)").as("content_xor")
        )
        .crossJoin(Seq(graft.sources.CsvSink.shardCount(s, out)).toDF("n_files"))
    }),
    // inverted-index construction: one row per token with doc-id-sorted
    // postings + tfs — two hash aggregates ((tok,doc) tf with map-side
    // partials, then per-token assembly), per-row size bounded by df
    // (invertedIndexBlocked is the stopword-skew layout; flatten law in
    // RetrievalSpec). The gate flattens the posting arrays to scalar
    // (tok, df, pos, doc_id, tf) rows — the driver compare hashes scalar
    // cells — with pos pinning each array element's position.
    "q107_inverted_index" -> ((s, dir) => {
      graft.operators.Retrieval
        .invertedIndex(t(s, dir, "documents"))
        .select(
          col("tok"),
          col("df"),
          posexplode(arrays_zip(col("doc_ids"), col("tfs"))).as(Seq("pos", "p"))
        )
        .select(
          col("tok"),
          col("df"),
          col("pos").cast("long").as("pos"),
          col("p.doc_ids").as("doc_id"),
          col("p.tfs").as("tf")
        )
        .orderBy(col("tok"), col("pos"))
    }),
    // conjunctive Boolean retrieval over the index: the tok filter pushes
    // into the index scan, only |Q| posting rows explode, and the AND is
    // one hash aggregate (HAVING n_hit = |Q|) — corpus text never touched
    "q108_index_search" -> ((s, dir) => {
      val idx = graft.operators.Retrieval.invertedIndex(t(s, dir, "documents"))
      graft.operators.Retrieval
        .searchAll(idx, Seq("dup", "vector", "merge"))
        .orderBy(col("doc_id"))
    }),
    // water-filling fair division of one global token budget across
    // sources: small sources keep their supply, large ones equalize at
    // the integer water level with the remainder distributed +1 by
    // source name — sum(alloc) == min(T, sum(supply)) EXACTLY; every
    // frame after the supply aggregate is sources-sized
    "q123_waterfill_budget" -> ((s, dir) => {
      graft.operators.Sampling
        .waterfillBudgets(t(s, dir, "documents"), 20000L)
        .orderBy(col("source"))
    }),
    // BM25 served FROM the index artifacts (inverted index + norms
    // table): the query's |Q| posting rows broadcast onto the norms
    // join, corpus text never read or re-tokenized — bit-identical to
    // q103's two-corpus-pass direct path (the oracle IS q103's SQL)
    "q124_bm25_indexed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = graft.operators.Retrieval.invertedIndex(docs)
      val dls = graft.operators.Retrieval.docLengths(docs)
      graft.operators.Retrieval
        .bm25TopKIndexed(idx, dls, Seq("dup", "vector", "merge"), 10)
        .orderBy(col("rnk"))
    }),
    // the PRODUCTION IVF serve path: codebook + cell assignments written
    // to parquet ONCE (the training jobs run at artifact-build, before
    // the returned plan exists), then queries served from the read-back
    // artifacts — the returned plan contains parquet scans and the cell
    // equi-join, NO Lloyd chain (PlanSpec-pinned); result == q37 exactly
    // TF-IDF (ltn) from the index artifact alone — the second classic
    // weighting family; the norms table contributes only the 1-row n
    "q141_tfidf_indexed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Retrieval
        .tfidfTopKIndexed(
          graft.operators.Retrieval.invertedIndex(docs),
          graft.operators.Retrieval.docLengths(docs),
          Seq("dup", "vector", "merge"),
          10
        )
        .orderBy(col("rnk"))
    }),
    // BATCH serving: a query TABLE scored against the artifacts in one
    // pass — shared terms' postings expand once, per-query top-k is the
    // bounded heap aggregate; query 3 == q124's single-query result
    "q142_bm25_batch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = s
        .createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(1L, Seq("dup", "vector")),
            org.apache.spark.sql.Row(2L, Seq("merge")),
            org.apache.spark.sql.Row(3L, Seq("dup", "vector", "merge"))
          ),
          org.apache.spark.sql.types.StructType(
            Seq(
              org.apache.spark.sql.types.StructField(
                "query_id",
                org.apache.spark.sql.types.LongType
              ),
              org.apache.spark.sql.types.StructField(
                "terms",
                org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
              )
            )
          )
        )
      graft.operators.Retrieval
        .bm25TopKIndexedBatch(
          graft.operators.Retrieval.invertedIndex(docs),
          graft.operators.Retrieval.docLengths(docs),
          queries,
          10
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    "q125_ann_ivf_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cbDir = dumpPath("ivf_q125_codebook", dir)
      val idxDir = dumpPath("ivf_q125_index", dir)
      val cb = Similarity.persistCodebook(Similarity.trainCodebook(emb))
      try {
        cb.centroids.write.mode("overwrite").parquet(cbDir)
        Similarity.ivfIndex(emb, cb).write.mode("overwrite").parquet(idxDir)
      } finally Similarity.releaseCodebook(cb)
      Similarity
        .annIvfServe(
          s.read.parquet(idxDir),
          s.read.parquet(cbDir),
          emb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L)),
          10
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    // proximity (NEAR/slop) search served from the positional index:
    // the two terms' posting rows explode and pair per doc — the
    // operator between exact phrase (slop=0) and AND (slop=inf), both
    // boundary laws spec-pinned; oracle = windowed self-join
    "q126_near_search" -> ((s, dir) => {
      val idx = graft.operators.Retrieval.invertedIndexPositional(t(s, dir, "documents"))
      graft.operators.Retrieval
        .searchNearIndexed(idx, "table", "vector", 3L)
        .orderBy(col("doc_id"))
    }),
    // LSH served from the persisted bucket artifact (the q125 discipline
    // on the LSH tier): corpus bucket rows written to parquet once —
    // data-independent hyperplanes, so the artifact never retrains and a
    // growing corpus APPENDS — then queries probe the read-back table
    "q129_ann_lsh_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = dumpPath("lsh_q129_index", dir)
      Similarity.lshIndex(emb).write.mode("overwrite").parquet(idxDir)
      Similarity
        .annLshServe(
          s.read.parquet(idxDir),
          emb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L)),
          10
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    // the live shape of a maintained IVF deployment between refits:
    // artifact candidates over the indexed 90% union an EXHAUSTIVE scan
    // of the un-indexed tail — a vector is searchable the batch it
    // arrives, full recall on the fresh slice, cells restored at refit
    "q136_ann_ivf_fresh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val indexed = emb.filter(col("vec_id") % 10 =!= 9)
      val tail = emb.filter(col("vec_id") % 10 === 9)
      val cb = Similarity.trainCodebook(indexed)
      Similarity
        .annIvfServeFresh(
          Similarity.ivfIndex(indexed, cb),
          cb.centroids,
          tail,
          emb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L)),
          10
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    // prefix/wildcard retrieval over the index: the startsWith predicate
    // pushes into the index scan (StringStartsWith — min/max-prunable on
    // the sorted dictionary); only the matched terms' postings explode
    "q128_prefix_search" -> ((s, dir) => {
      val idx = graft.operators.Retrieval.invertedIndex(t(s, dir, "documents"))
      graft.operators.Retrieval
        .searchPrefix(idx, "s")
        .orderBy(col("doc_id"))
    }),
    // Boolean retrieval: must-AND + mustNot as a LEFT ANTI against the
    // negated terms' disjunction — BOTH legs read only posting rows
    "q122_bool_search" -> ((s, dir) => {
      val idx = graft.operators.Retrieval.invertedIndex(t(s, dir, "documents"))
      graft.operators.Retrieval
        .searchBoolean(idx, Seq("dup", "vector"), Seq("merge"))
        .orderBy(col("doc_id"))
    }),
    // phrase search served FROM the positional index artifact: the
    // phrase's index rows explode back to occurrences and the same
    // normalized-start joins intersect them — corpus text never read;
    // gate == q114's oracle (indexed == direct)
    "q116_phrase_indexed" -> ((s, dir) => {
      val idx = graft.operators.Retrieval.invertedIndexPositional(t(s, dir, "documents"))
      graft.operators.Retrieval
        .searchPhraseIndexed(idx, Seq("table", "hash"))
        .orderBy(col("doc_id"))
    }),
    // HyperLogLog distinct estimate per group: m=16 registers via one
    // partial-aggregated max per (group, reg) — duplicates never
    // shuffle; the estimate's ln-based small-range branch reads a
    // precomputed literal table so it is hash-exact across engines
    "q118_hll_distinct" -> ((s, dir) => {
      graft.operators.Sketch
        .hllDistinct(t(s, dir, "documents"), "lang", "text")
        .orderBy(col("lang"))
    }),
    // generic table profiler (the ANALYZE surface): one pass, every
    // column's null/distinct/min/max riding a single agg row melted to
    // schema-sized per-column rows
    "q117_table_profile" -> ((s, dir) => {
      graft.operators.Report
        .profileTable(t(s, dir, "documents"))
        .orderBy(col("column"))
    }),
    // exact phrase search: one positional explode filtered to the
    // phrase's terms (only those occurrences shuffle), then |phrase|-1
    // equi-joins on (doc, normalized start position)
    "q114_phrase_search" -> ((s, dir) => {
      graft.operators.Retrieval
        .searchPhrase(t(s, dir, "documents"), Seq("table", "hash"))
        .orderBy(col("doc_id"))
    }),
    // incremental index maintenance: the indexes of two disjoint corpus
    // halves merged through posting-row re-aggregation must equal the
    // full rebuild EXACTLY — the oracle is q107's full-corpus SQL
    "q115_index_merge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = graft.operators.Retrieval.invertedIndex(docs.filter(col("doc_id") < 250))
      val b = graft.operators.Retrieval.invertedIndex(docs.filter(col("doc_id") >= 250))
      graft.operators.Retrieval
        .mergeIndexes(a, b)
        .select(
          col("tok"),
          col("df"),
          posexplode(arrays_zip(col("doc_ids"), col("tfs"))).as(Seq("pos", "p"))
        )
        .select(
          col("tok"),
          col("df"),
          col("pos").cast("long").as("pos"),
          col("p.doc_ids").as("doc_id"),
          col("p.tfs").as("tf")
        )
        .orderBy(col("tok"), col("pos"))
    }),
    // eval-exposure report (the reverse contamination direction): for
    // each benchmark item, how many corpus docs share a 4-gram with it
    // and how many of its distinct grams are exposed
    "q99_bench_exposure" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val b = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Decontaminate
        .benchmarkExposure(docs.filter(b < 8), docs.filter(b >= 8), k = 4)
        .orderBy(col("bench_id"))
    }),
    // span-level decontamination: cut every benchmark-overlapping
    // 4-token window and KEEP the rest of the document (q66 drops the
    // whole doc) — broadcast gram index + the shared interval-merge
    // rebuild
    "q96_redact_overlaps" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val b = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Decontaminate
        .redactOverlaps(docs.filter(b < 8), docs.filter(b >= 8), k = 4)
        .orderBy(col("doc_id"))
    }),
    // DSIR fidelity upgrade: hashed BIGRAM features (the paper's n-gram
    // selector) + importance RESAMPLING — systematic ∝-weight selection
    // in content-hash order (distribution-matching, not a hard cutoff),
    // all integer arithmetic, two-phase prefix sum
    "q95_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val weights = graft.operators.Importance.train(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"),
        k = 2
      )
      graft.operators.Importance
        .resampleImportant(
          docs.filter(col("lang") =!= "en"),
          weights,
          sampleTarget = 50,
          seed = 7L,
          k = 2
        )
        .orderBy(col("doc_id"))
    }),
    // the MIXING-composed pipeline: scrub -> Gopher -> quality -> exact+
    // near dedup -> DSIR importance filter (mean-relative threshold) ->
    // temperature mix by lang -> per-source token budget -> shard plan,
    // nine stages end to end (q94 gates the composition; each stage is
    // gated alone by q22/q88/q20/q42/q92/q78/q93/q89)
    "q94_mix_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bucket = GraftExpressions.poly_hash(col("text")) % 10
      graft.operators.Pipeline
        .mixCorpus(
          docs.filter(bucket < 9),
          docs.filter(bucket >= 9),
          budgetTokens = 300L,
          nShards = 8,
          seed = 42L
        )
        .orderBy(col("doc_id"))
    }),
    // top-V vocabulary + per-doc OOV profile: the tokenizer-prep step —
    // vocab by (count desc, token) with a bounded top-V (no global sort),
    // OOV rates in integer permille against the broadcast vocabulary
    "q81_vocab_oov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.operators.Vocabulary.build(docs, 1000)
      graft.operators.Vocabulary
        .oovProfile(docs, vocab)
        .orderBy(col("doc_id"))
    }),
    // exact-substring dedup at window granularity (Lee et al. 2021):
    // every non-first occurrence of any duplicated >= 6-token run is cut
    // at ARBITRARY positions — the sliding-window upgrade of q70's tiling
    "q80_substring_dedup" -> ((s, dir) => {
      graft.operators.SegmentDedup
        .dedupSubstrings(t(s, dir, "documents"), minTokens = 6)
        .orderBy(col("doc_id"))
    }),
    // leakage-safe split: whole near-dup clusters co-assign to train/val
    // by the representative's content hash — the eval-hygiene step a
    // plain per-document hash split cannot provide
    "q79_split_by_cluster" -> ((s, dir) => {
      Dedup
        .splitByCluster(t(s, dir, "documents"), 0.8, 80)
        .orderBy(col("doc_id"))
    }),
    // temperature-flattened mixture (T=2 sqrt sampling): per-language
    // rates derived from the corpus itself inside the plan, rarest
    // language kept whole — the multilingual rebalancing recipe
    "q78_temperature_mix" -> ((s, dir) => {
      graft.operators.Sampling
        .temperatureFlatten(t(s, dir, "documents"), "lang", "text", 2)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),
    // int8-quantized ANN: symmetric scalar quantization (max-abs scale,
    // codes in [-127,127]) and cosine over pure integer code sums — the
    // 4x-memory-compression scale path for billion-vector search
    "q77_ann_quantized" -> ((s, dir) => {
      Similarity
        .annQuantized(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // RefinedWeb-style source reputation: per-source quality/PII profile
    // with integer-permille ratios — the container-level admission gate
    "q76_source_reputation" -> ((s, dir) => {
      graft.operators.QualityChecks
        .sourceReputation(t(s, dir, "documents"))
        .orderBy(col("source"))
    }),
    // balanced per-group sampling: n smallest content hashes per language
    // via the bounded-heap aggregate — no per-group sort anywhere
    "q63_balanced_sample" -> ((s, dir) => {
      graft.operators.Sampling
        .balanced(t(s, dir, "documents"), "lang", 20, "text")
        .orderBy(col("lang"), col("doc_id"))
    }),
    "q33_hash_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextFunctions.splitAssign(col("text"), 80).as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("lang"))
    }),
    "q34_top_terms" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tf = docs
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df_ = docs
        .select(col("lang"), explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("df"))
      // integer burstiness salience tf*1e6 div df — deliberately integer
      // arithmetic (no ln()) so both engines rank identically bit-for-bit
      val scored = tf
        .join(df_, Seq("lang", "tok"))
        .withColumn("salience", expr("tf * 1000000 div df"))
      val w = Window.partitionBy(col("lang")).orderBy(col("salience").desc, col("tok"))
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("lang"), col("rnk"), col("tok"), col("salience"), col("tf"), col("df"))
        .orderBy(col("lang"), col("rnk"))
    }),
    // canonical normalization (whitespace collapse + NFC) with an audit
    // flag — the step before any content hash; one codegen'd scan
    "q87_normalize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs
        .select(
          col("doc_id"),
          TextFunctions.normalize(col("text")).as("text"),
          (TextFunctions.normalize(col("text")) =!= col("text")).as("changed")
        )
        .orderBy(col("doc_id"))
    }),
    // Gopher structural heuristics (audit form): per-doc integer rule
    // metrics + keep flag from ONE fused kernel scan — the hard
    // structural gates that run before any model-based quality scoring
    "q88_doc_heuristics" -> ((s, dir) => {
      graft.operators.Heuristics
        .gopherRules(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    // deterministic training-order shard plan: (shard, position) as a
    // pure function of (id, seed) — a reproducible global shuffle whose
    // physical plan IS the writer's (one exchange on shard, per-shard
    // sort); no RNG, no global sort, no driver state
    // the release manifest over q89's plan: per-shard counts, token and
    // char totals, and the content/order XOR digest pair — the table a
    // dataset release ships next to its shards; nShards rows at rest
    "q140_manifest" -> ((s, dir) => {
      graft.operators.Sampling
        .shardManifest(t(s, dir, "documents"), 8, 42L)
        .orderBy(col("shard"))
    }),
    "q89_shuffle_plan" -> ((s, dir) => {
      graft.operators.Sampling
        .shufflePlan(t(s, dir, "documents"), nShards = 8, seed = 42L)
        .orderBy(col("shard"), col("position"))
    }),
    // exact per-lang quartiles from a VALUE histogram — the scale shape
    // for integer-valued stats: groupBy (lang, n_tok) partial-aggregates
    // the corpus down to at most |distinct lengths| rows per language, so
    // the cumulative window sorts values, never documents (q35's
    // row_number ranks every doc inside each language partition — exact
    // reference semantics, but a 60%-of-corpus language is one sorting
    // straggler at scale; here it is one histogram row per length).
    // Quantile convention = q35's lower median: smallest value whose
    // cumulative count reaches ceil(p·n) (cum·den >= n·num, integer-exact)
    "q86_token_quantiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(
        col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok")
      )
      val hist = toks.groupBy(col("lang"), col("n_tok")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n_tok"))
      // per-lang totals come from a partition window over the HISTOGRAM
      // (not a join back to the corpus): one less scan, and a NULL lang
      // is its own window partition rather than an equi-join casualty
      val cum = hist
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n_docs", sum(col("c")).over(Window.partitionBy(col("lang"))))
      def lowerQ(num: Int, den: Int) =
        min(when(col("cum") * den >= col("n_docs") * num, col("n_tok")))
      cum
        .groupBy(col("lang"))
        .agg(
          max(col("n_docs")).as("n_docs"),
          lowerQ(1, 4).as("p25_tok"),
          lowerQ(1, 2).as("p50_tok"),
          lowerQ(3, 4).as("p75_tok")
        )
        .orderBy(col("lang"))
    }),
    "q35_token_median" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(
        col("lang"),
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok")
      )
      val w = Window.partitionBy(col("lang")).orderBy(col("n_tok"), col("doc_id"))
      val ranked = toks.withColumn("rn", row_number().over(w).cast("long"))
      val stats = toks
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n_tok")).as("min_tok"),
          max(col("n_tok")).as("max_tok")
        )
      // lower median: the ceil(n/2)-th smallest — integer-exact, no
      // interpolation semantics to disagree on between engines
      ranked
        .join(stats, "lang")
        .filter(col("rn") === expr("(n_docs + 1) div 2"))
        .select(col("lang"), col("n_docs"), col("min_tok"), col("max_tok"), col("n_tok").as("median_tok"))
        .orderBy(col("lang"))
    }),
    // similarity search ---------------------------------------------------
    "q30_ann_brute" -> ((s, dir) => {
      Similarity
        .bruteForceTopK(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // spectral embedding hygiene: the top principal component by
    // integer power iteration (12 offset-normalized rounds over the
    // exact decimal second-moment matrix), then every vector's PC1
    // projection — the "all-but-the-top" direction, bit-replayable
    "q138_pca_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Spectral
        .projectPrincipal(emb, graft.operators.Spectral.principalComponent(emb, 12))
        .orderBy(col("vec_id"))
    }),
    // all-but-the-top: every vector's component along the trained top
    // direction removed — exact-integer inputs, the one necessary
    // division in fixed-order double (the cosine-oracle discipline)
    "q139_pca_remove" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Spectral
        .removePrincipal(emb, graft.operators.Spectral.principalComponent(emb, 12))
        .orderBy(col("vec_id"), col("j"))
    }),
    // diversity-aware retrieval: maximal marginal relevance over the
    // brute-force pool — k driver-iterated selection rounds, each an
    // argmax of lambda*rel - (1-lambda)*max-sim-to-selected over the
    // bounded pool; the "k nearest but not near-duplicate" selector
    "q137_mmr_topk" -> ((s, dir) => {
      Similarity
        .mmrTopK(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 5, 20, 700)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "q31_ann_lsh" -> ((s, dir) => {
      Similarity
        .annLsh(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "q37_ann_ivf" -> ((s, dir) => {
      Similarity
        .annIvf(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // IVF cell pruning + int8 candidate scoring — q37's pruning composed
    // with q77's quantization: the memory-compressed billion-scale scan
    "q83_ann_ivf_quantized" -> ((s, dir) => {
      Similarity
        .annIvfQuantized(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // q37's search with the codebook trained on the deterministic 1-in-2
    // id sample — the production trainer: Lloyd cost halves (n/every per
    // round), the per-vector assignment/probing stages are unchanged
    "q84_ann_ivf_sampled" -> ((s, dir) => {
      Similarity
        .annIvfSampled(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10, every = 2)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // JL random projection feeding the same ANN contract: 64d -> 16d via
    // the deterministic planeWeight matrix (no fit step), then brute
    // top-5 over the projected vectors — the dimensionality lever in
    // front of the vector stack, recall-gated in AnnRecallSpec
    "q119_ann_projected" -> ((s, dir) => {
      Similarity
        .bruteForceTopK(
          Similarity.randomProject(t(s, dir, "embeddings"), 16),
          Seq(0L, 1L, 2L),
          5
        )
        .orderBy(col("query_id"), col("rnk"))
    }),
    // product quantization (m=4 subspace Lloyd codebooks, asymmetric
    // reconstruction scoring): the corpus candidate stream carries m
    // integer codes instead of 64 floats — the 64x compression tier under
    // int8's 4x; recall gated in AnnRecallSpec, refined variant reranks
    // a shortlist exactly
    "q110_ann_pq" -> ((s, dir) => {
      Similarity
        .annPqAdc(t(s, dir, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // end-to-end multimodal pipeline: binary payload -> partition-parallel
    // decode (stub codec, real plumbing) -> similarity over the decoded
    // features. The decode stage is mapPartitions (not SQL), but the STUB
    // codec is a deterministic byte-fold over UTF-8 payloads — which IS
    // SQL-expressible, so the oracle mirrors it per-codepoint (the fixture
    // is pure ASCII: bytes == codepoints) and the whole pipeline gets a
    // full hash-match instead of round 2's rows-only check.
    "q41_multimodal_ann" -> ((s, dir) => {
      val media = Multimodal.attachPayload(t(s, dir, "documents"))
      val feats = Multimodal
        .decodeFeaturesStub(media, dim = 8)
        .toDF()
        .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
      Similarity.bruteForceTopK(feats, Seq(0L, 1L, 2L), 5).orderBy(col("query_id"), col("rnk"))
    }),
    // parity dump pipeline (O9-O11, dump_table.py:175-248) ----------------
    // A REAL dump runs inside the query: scan documents → sharded parquet
    // write → footer-only read-back; the returned row is the report, which
    // the oracle pins to pure counts over the same table. Input coalesced to
    // one partition so file COUNT is deterministic (row totals never depend
    // on partitioning; the multi-partition invariants live in ShardingSpec).
    "q50_dump_roundtrip" -> ((s, dir) => {
      val out = dumpPath("dump_q50", dir)
      val src = new ParquetNoteSource(s"$dir/documents.parquet", coalesceTo = Some(1))
      val res = OmopDump.run(s, src, out, limit = None, ParquetLayout(maxRecordsPerFile = 1000L))
      import s.implicits._
      Seq(
        (
          res.report.totalRows,
          res.report.numFiles.toLong,
          res.report.shards.map(_.rows).max,
          res.sourceCount
        )
      ).toDF("total_rows", "n_files", "max_file_rows", "source_count")
    }),
    "q51_dump_limit" -> ((s, dir) => {
      val out = dumpPath("dump_q51", dir)
      val src = new ParquetNoteSource(s"$dir/documents.parquet", coalesceTo = Some(1))
      val res = OmopDump.run(s, src, out, limit = Some(123L), ParquetLayout(maxRecordsPerFile = 1000L))
      import s.implicits._
      Seq((res.report.totalRows, res.sourceCount)).toDF("total_rows", "source_count")
    }),
    // partitioned-layout round-trip: real write, read back with partition
    // pruning; oracle pins totals + per-partition counts to pure SQL
    "q52_dump_partitioned" -> ((s, dir) => {
      val out = dumpPath("dump_q52", dir)
      graft.sources.Layouts.writePartitioned(t(s, dir, "documents"), out, Seq("lang"))
      val back = s.read.parquet(out)
      back
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),
    // small-file compaction round-trip: fragment documents into ~50-row
    // files, compact to 1000-row files, report (rows, files before/after)
    // — all three pinned to pure COUNT arithmetic in the oracle
    "q54_compact" -> ((s, dir) => {
      val small = dumpPath("compact_q54_small", dir)
      val out = dumpPath("compact_q54_out", dir)
      t(s, dir, "documents")
        .coalesce(1)
        .write.mode("overwrite").option("maxRecordsPerFile", 50L).parquet(small)
      val rep = graft.sources.Layouts.compact(s, small, out, 1000L)
      import s.implicits._
      Seq((rep.rows, rep.filesBefore.toLong, rep.filesAfter.toLong))
        .toDF("n_rows", "files_before", "files_after")
    }),
    // salted skew join: same aggregate as q53 but through the manual
    // salt-and-replicate path — the oracle (a plain join) pins that
    // salting changes the PLAN, never the RESULT
    "q55_salted_join" -> ((s, dir) => {
      graft.operators.SkewJoin
        .saltedJoin(
          t(s, dir, "orders"),
          t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey",
          factUniqueCol = "o_orderkey",
          salts = 8
        )
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          countDistinct(col("o_custkey")).as("n_customers")
        )
        .orderBy(col("c_mktsegment"))
    }),
    // bucketed-layout round-trip: write both join sides co-bucketed on the
    // join key (real saveAsTable through the catalog), join the BUCKETED
    // tables back, aggregate. Promotes LayoutsSpec's no-Exchange plan proof
    // into the oracle gate: the oracle computes the same join over the raw
    // parquet, so a bucketing write that drops/duplicates rows hash-fails.
    "q53_bucketed_join" -> ((s, dir) => {
      graft.sources.Layouts.writeBucketed(t(s, dir, "orders"), "graft_q53_orders", 8, "o_custkey")
      graft.sources.Layouts.writeBucketed(
        t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "graft_q53_customer", 8, "o_custkey"
      )
      s.table("graft_q53_orders")
        .join(s.table("graft_q53_customer"), "o_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          countDistinct(col("o_custkey")).as("n_customers")
        )
        .orderBy(col("c_mktsegment"))
    }),
    // multimodal plumbing --------------------------------------------------
    // resize-to-fixed-shape on the binary payload: truncate-or-pad to 128
    // bytes; the fixture payload is ASCII so the oracle mirrors the byte
    // ops as string ops and re-encodes
    "q44_multimodal_resize" -> ((s, dir) => {
      // raw binary can't hash-compare through the oracle harness (pandas
      // can't factorize bytearrays), so the gate pins length + content
      // CHECKSUM of the resized bytes
      Multimodal
        .resizePayload(Multimodal.attachPayload(t(s, dir, "documents")), 128)
        .select(
          col("doc_id"),
          octet_length(col("payload_resized")).cast("long").as("n_bytes"),
          GraftExpressions.poly_hash(decode(col("payload_resized"), "UTF-8")).as("checksum")
        )
        .orderBy(col("doc_id"))
    }),
    "q40_multimodal_meta" -> ((s, dir) => {
      Multimodal
        .attachPayload(t(s, dir, "documents"))
        .select(
          col("doc_id"),
          col("meta.n_bytes").cast("long").as("n_bytes"),
          col("mime"),
          col("meta.checksum").as("checksum"),
          (floor((col("meta.n_bytes").cast("double") - lit(1.0)) / lit(64.0)).cast("long") + lit(1L))
            .as("n_frames")
        )
        .orderBy(col("doc_id"))
    })
  )

  // ------------------------------------------------------------ oracle SQL

  import OracleFragments._

  /** The deterministic IVF k-means trainer as a DuckDB CTE chain (mirrors
    * `Similarity.trainedCentroids` exactly — seed = every ⌊n/C⌋-th vector,
    * then fixed Lloyd rounds of argmax assignment + integer-quantized
    * element-wise means; parallel unnests zip in DuckDB; SUM(BIGINT) cast
    * back down from HUGEINT). The final codebook CTE is [[ivfFinalCent]].
    * Shared by the q37/q83 (ANN) and q71 (semantic dedup) oracles.
    *
    * `cellsOfN` is the codebook-size derivation as a SQL expression over
    * the corpus count column `n` — [[annCellsSql]] mirrors
    * `Similarity.annCells` (⌈√(n/2)⌉), [[semDedupCellsSql]] mirrors
    * `Similarity.semDedupCells` (⌈n/64⌉); both are exact IEEE arithmetic
    * so the two engines derive the identical C.
    */
  private lazy val ivfFinalCent: String = s"cent${Similarity.IvfLloydRounds}"
  private val annCellsSql: String = "CAST(ceil(sqrt(n / 2.0)) AS BIGINT)"
  private val semDedupCellsSql: String =
    s"(n + ${Similarity.SemDedupCellSize - 1}) // ${Similarity.SemDedupCellSize}"
  /** The SemDeDup oracle chain (trainer -> argmax cells -> in-cell
    * >=-threshold pairs -> recursive min-label components -> keeper
    * flags), parameterized by the codebook-size expression: q71 uses the
    * occupancy-pinned derivation, q85 the ANN sqrt-derivation.
    */
  private def semDedupOracle(cellsSql: String, sampleEvery: Int = 1): String = {
    // sampled trainer (q84's tsrc discipline): the codebook CTEs run over
    // the re-indexed 1-in-`sampleEvery` id sample; assignment, pairs and
    // components below read the full corpus unchanged
    val (samplePrefix, trainerSrc) =
      if (sampleEvery == 1) ("", "embeddings")
      else (
        s"""tsrc AS (
           SELECT vec_id // $sampleEvery AS vec_id, embedding FROM embeddings
           WHERE vec_id % $sampleEvery = 0
         ), """,
        "tsrc"
      )
    s"""WITH RECURSIVE $samplePrefix${ivfTrainerCtes(cellsSql, trainerSrc)}, scores AS (
           SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
           FROM embeddings e CROSS JOIN $ivfFinalCent ct
         ), assigned AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
             FROM scores) t WHERE r = 1
         ), pairs AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
           FROM assigned a
           JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
           JOIN embeddings ea ON ea.vec_id = a.vec_id
           JOIN embeddings eb ON eb.vec_id = b.vec_id
           WHERE ${cosine("ea.embedding", "eb.embedding")} >= 0.4
         ), edges AS (
           SELECT vec_a AS src, vec_b AS dst FROM pairs
           UNION ALL SELECT vec_b, vec_a FROM pairs
         ), reach(n, l) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.n
         ), labels AS (
           SELECT n AS vec_id, MIN(l) AS cluster_id FROM reach GROUP BY n
         )
         SELECT a.vec_id, a.cell, lb.cluster_id,
           (a.vec_id = lb.cluster_id) AS keep
         FROM assigned a JOIN labels lb ON a.vec_id = lb.vec_id
         ORDER BY a.vec_id"""
  }

  /** The CCNet bigram-LM chain (train on the 80% content-hash slice,
    * score the held-out 20%) as a CTE body ending in
    * `lmdoc (doc_id, n_grams, n_unseen, rarity_avg)` — shared by the
    * q75 (scores) and q90 (perplexity buckets) oracles.
    */
  private lazy val lmRarityCtes: String =
    s"""split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), toks AS (
           SELECT doc_id, b,
             ${positionalShingleHashes("text", 1)} AS p1,
             ${positionalShingleHashes("text", 2)} AS p2
           FROM split
         ), pairs AS (
           SELECT doc_id, b, unnest((p1)[1:len(p2)]) AS p, unnest(p2) AS g
           FROM toks
         ), grams AS (
           SELECT g, COUNT(*) AS c FROM pairs WHERE b < 8 GROUP BY 1
         ), prefixes AS (
           SELECT p, COUNT(*) AS cp FROM pairs WHERE b < 8 GROUP BY 1
         ), vocab AS (
           SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS v
           FROM (SELECT unnest(p1) AS u FROM toks WHERE b < 8) t0
         ), scored AS (
           SELECT pairs.doc_id,
             ((coalesce(cp, 0) + v) * 1000000) // (coalesce(c, 0) + 1) AS rarity,
             CASE WHEN c IS NULL THEN 1 ELSE 0 END AS unseen
           FROM pairs
           LEFT JOIN grams USING (g)
           LEFT JOIN prefixes USING (p)
           CROSS JOIN vocab
           WHERE b >= 8
         ), lmdoc AS (
           SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(unseen) AS BIGINT) AS n_unseen,
             CAST(SUM(rarity) // COUNT(*) AS BIGINT) AS rarity_avg
           FROM scored GROUP BY 1
         )"""

  private def ivfTrainerCtes(
      cellsOfN: String,
      src: String = "embeddings",
      p: String = ""
  ): String = {
    val q = Similarity.IvfQuant // prints as 1000000.0
    def lloyd(idx: Int): String =
      s"""${p}s$idx AS (
         SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
         FROM $src e CROSS JOIN ${p}cent$idx ct
       ), ${p}a$idx AS (
         SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
           FROM ${p}s$idx) t WHERE r = 1
       ), ${p}ex$idx AS (
         SELECT a.cell, unnest(e.embedding) AS x, unnest(range(len(e.embedding))) AS j
         FROM ${p}a$idx a JOIN $src e ON a.vec_id = e.vec_id
       ), ${p}sm$idx AS (
         SELECT cell, j,
           CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * $q + 0.5) AS BIGINT)) AS BIGINT) AS sx,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM ${p}ex$idx GROUP BY 1, 2
       ), ${p}cent${idx + 1} AS (
         SELECT cell, list(CAST(CAST(sx AS DOUBLE) / (cnt * $q) AS FLOAT) ORDER BY j) AS c_emb
         FROM ${p}sm$idx GROUP BY cell
       )"""
    val rounds = (0 until Similarity.IvfLloydRounds).map(lloyd).mkString(", ")
    s"""${p}nn AS (
         SELECT greatest(1, cells0) AS cells,
           greatest(1, n // greatest(1, cells0)) AS stride
         FROM (SELECT n, $cellsOfN AS cells0
               FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM $src))
       ),
       ${p}cent0 AS (
         SELECT CAST(vec_id // stride AS BIGINT) AS cell, embedding AS c_emb
         FROM $src, ${p}nn WHERE vec_id % stride = 0 AND vec_id < stride * cells
       ), $rounds"""
  }

  /** The q110 PQ oracle: m per-subspace Lloyd trainer chains (the
    * [[ivfTrainerCtes]] machinery over sliced embeddings, CTE names
    * prefixed `p0…`), argmax-cosine encoding per (vector, subspace) with
    * the (cos DESC, cell) tie-break, reconstruction by subspace-ordered
    * concatenation, then q30's ranking over `cosine(q, recon)`.
    */
  private def pqAdcOracle(m: Int, k: Int): String = {
    val dsub = Similarity.Dim / m
    val subSrcs = (0 until m)
      .map(s =>
        s"sub${s}src AS (SELECT vec_id, embedding[${s * dsub + 1}:${(s + 1) * dsub}] AS embedding FROM embeddings)"
      )
      .mkString(", ")
    val trainers =
      (0 until m).map(s => ivfTrainerCtes(annCellsSql, s"sub${s}src", s"p$s")).mkString(", ")
    val encUnion = (0 until m)
      .map { s =>
        s"""SELECT vec_id, CAST($s AS BIGINT) AS sub, cell FROM (
           SELECT e.vec_id, ct.cell,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosine("e.embedding", "ct.c_emb")} DESC, ct.cell) AS r
           FROM sub${s}src e CROSS JOIN p$s$ivfFinalCent ct) t WHERE r = 1"""
      }
      .mkString(" UNION ALL ")
    val cbUnion = (0 until m)
      .map(s => s"SELECT CAST($s AS BIGINT) AS sub, cell, c_emb FROM p$s$ivfFinalCent")
      .mkString(" UNION ALL ")
    s"""WITH $subSrcs, $trainers, enc AS ($encUnion), cb AS ($cbUnion),
       recon AS (
         SELECT enc.vec_id, flatten(list(cb.c_emb ORDER BY enc.sub)) AS recon
         FROM enc JOIN cb ON enc.sub = cb.sub AND enc.cell = cb.cell
         GROUP BY enc.vec_id
       ), q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${cosine("q.embedding", "c.recon")} AS cos
         FROM q JOIN recon c ON q.vec_id <> c.vec_id
       ), ranked AS (
         SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM scored
       )
       SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
       FROM ranked WHERE rnk <= $k ORDER BY query_id, rnk"""
  }

  /** The q94 mixing-pipeline CTE chain (scrub → Gopher → quality →
    * exact+near dedup → DSIR weights/threshold → temperature mix →
    * per-source budget → shard-plan hash), shared by q94 (the plan) and
    * q97 (the materialized artifact, which also compares `text`) — `adm`
    * carries the scrubbed text so both final SELECTs read one chain.
    */
  private lazy val mixPipelineCtes: String = {
    val tok = tokens("text")
    val nTok = s"len($tok)"
    val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
    val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
    val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
    val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
    val stopScore = s"least(1.0, $stopRatio * 5.0)"
    val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
    val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
    val quality = s"(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore)"
    val scrubExpr =
      s"regexp_replace(regexp_replace(text, '${TextFunctions.EmailRegex}', '<email>', 'g'), " +
        s"'${TextFunctions.LongNumberRegex}', '<num>', 'g')"
    val B = graft.operators.Importance.DefaultBuckets
    val S = graft.operators.Importance.Scale
    s"""WITH RECURSIVE raw AS (
           SELECT doc_id, lang, source, text, (${polyHash("text")} % 10) AS bkt FROM documents
         ), scrubbed AS (
           SELECT doc_id, lang, source, $scrubExpr AS text FROM raw WHERE bkt < 9
         ), targ AS (
           SELECT $scrubExpr AS text FROM raw WHERE bkt >= 9
         ), gph AS (
           SELECT doc_id, lang, source, text FROM scrubbed
           WHERE ${gopherKeepPredicate("text")}
         ), qual AS (
           SELECT doc_id, lang, source, text FROM gph WHERE $quality >= 0.4275
         ), ex AS (
           SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY text
         ), exd AS (
           SELECT qual.doc_id, qual.lang, qual.source, qual.text FROM qual JOIN ex USING (doc_id)
         ), ${clusterChain("exd")}, scored AS (
           SELECT doc_id, round($quality, 6) AS score FROM exd
         ), ranked AS (
           SELECT c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY s.score DESC, c.doc_id) AS rn
           FROM cc c JOIN scored s ON c.doc_id = s.doc_id
         ), surv AS (
           SELECT exd.doc_id, exd.lang, exd.source, exd.text
           FROM exd JOIN ranked ON exd.doc_id = ranked.doc_id AND ranked.rn = 1
         ), tbr AS (
           SELECT doc_id, unnest(${positionalShingleHashes("text", 1)}) % $B AS b FROM surv
         ), tbt AS (
           SELECT unnest(${positionalShingleHashes("text", 1)}) % $B AS b FROM targ
         ), tc AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tbt GROUP BY 1
         ), rcn AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tbr GROUP BY 1
         ), w AS (
           SELECT coalesce(tc.b, rcn.b) AS b,
             ((coalesce(ct, 0) + 1) * $S) // (coalesce(cr, 0) + 1) AS w
           FROM tc FULL JOIN rcn ON tc.b = rcn.b
         ), imp AS (
           SELECT doc_id, CAST(SUM(coalesce(w, $S)) // COUNT(*) AS BIGINT) AS imp_avg
           FROM tbr LEFT JOIN w USING (b) GROUP BY 1
         ), thr AS (
           SELECT (SUM(imp_avg) // COUNT(*)) * 1000 // 1000 AS m FROM imp
         ), kept AS (
           SELECT surv.doc_id, surv.lang, surv.source, surv.text
           FROM surv JOIN imp USING (doc_id), thr WHERE imp_avg >= m
         ), lc AS (
           SELECT lang, COUNT(*) AS n_g FROM kept GROUP BY 1
         ), lm AS (
           SELECT MIN(n_g) AS n_min FROM lc
         ), lthr AS (
           SELECT lang,
             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS DOUBLE))
               * 1000000.0) AS BIGINT) AS thr
           FROM lc, lm
         ), samp AS (
           SELECT kept.doc_id, kept.lang, kept.source, kept.text
           FROM kept JOIN lthr ON kept.lang IS NOT DISTINCT FROM lthr.lang
           WHERE (${polyHash("kept.text")} % 1000000) < thr
         ), bt AS (
           SELECT doc_id, lang, source, text,
             CAST(len($tok) AS BIGINT) AS n_tok,
             ${polyHash("text")} AS h
           FROM samp
         ), adm AS (
           SELECT doc_id, lang, source, text, n_tok, cum_tok FROM (
             SELECT doc_id, lang, source, text, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             FROM bt) c0
           WHERE cum_tok <= 300
         ), ph0 AS (
           SELECT doc_id,
             ${polyHash("(CAST(doc_id AS VARCHAR) || ':42')")} AS h0
           FROM adm
         ), ph AS (
           SELECT doc_id, ${remix32("h0")} AS h FROM ph0
         )"""
  }

  /** The BPE-trainer oracle: `nMerges` unrolled rounds, each = adjacent
    * pair counts over the word table, a LIMIT-1 argmax (count desc, then
    * pair — the engine's tie-break), and the merge applied by the SAME
    * string-accumulator left fold the Scala side runs (`list_reduce`
    * with a chr(31)-delimited accumulator; a fused symbol no longer ends
    * with `sep+left`, so it cannot re-fuse within the round). An
    * exhausted round leaves its m-CTE empty, emptying every later round
    * — mirroring the engine's early stop.
    */
  private def bpeChain(nMerges: Int, wordpiece: Boolean = false): String = {
    val sep = "chr(31)"
    // WordPiece rounds reference the previous symbol table THREE times
    // (pairs, symbol counts, fold) — DuckDB inlines plain CTEs, so s8
    // would expand to 3^8 scans of the base table and exhaust file
    // handles; MATERIALIZED pins each round to one evaluation. (The BPE
    // chain's 2-way reference stays as-is — the gated plain-CTE form.)
    val mat = if (wordpiece) "MATERIALIZED " else ""
    def round(i: Int): String = {
      val prev = s"s${i - 1}"
      // WordPiece: per-round weighted symbol counts feed the likelihood
      // argmax (pc / lc) / rc with the SAME fixed double-division order
      // as the Spark trainer; BPE ranks on the raw pair count
      val selector =
        if (wordpiece)
          s""", sy$i AS (
             SELECT s, CAST(SUM(cnt) AS BIGINT) AS c FROM (
               SELECT cnt, unnest(syms) AS s FROM $prev) ty$i GROUP BY 1
           ), m$i AS (
             SELECT p.l, p.r, p.total FROM p$i p
             JOIN sy$i sl ON sl.s = p.l
             JOIN sy$i sr ON sr.s = p.r
             ORDER BY (CAST(p.total AS DOUBLE) / CAST(sl.c AS DOUBLE)) / CAST(sr.c AS DOUBLE)
               DESC, p.l, p.r LIMIT 1
           )"""
        else
          s""", m$i AS (
             SELECT l, r, total FROM p$i ORDER BY total DESC, l, r LIMIT 1
           )"""
      s""", p$i AS (
           SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS total FROM (
             SELECT cnt, syms[j+1] AS l, syms[j+2] AS r
             FROM $prev, unnest(range(0, len(syms) - 1)) AS u(j)
           ) t$i GROUP BY 1, 2
         )$selector, s$i AS $mat(
           SELECT w, string_split(substr(list_reduce(list_prepend('', syms),
             (acc, x) -> CASE WHEN right(acc, length($sep || l)) = $sep || l AND x = r
               THEN acc || x ELSE acc || $sep || x END), 2), $sep) AS syms, cnt
           FROM $prev, m$i
         )"""
    }
    s"""WITH words AS (
         SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
           SELECT unnest(${tokens("text")}) AS w FROM documents) t0
         WHERE length(w) > 0 GROUP BY w
       ), s0 AS (
         SELECT w, string_split_regex(w, '') AS syms, cnt FROM words
       )${(1 to nMerges).map(round).mkString}"""
  }

  private def bpeOracle(nMerges: Int, wordpiece: Boolean = false): String = {
    val unions = (1 to nMerges)
      .map(i =>
        s"""SELECT CAST($i AS BIGINT) AS merge_idx, l AS "left", r AS "right", total AS pair_count FROM m$i"""
      )
      .mkString("\n         UNION ALL ")
    s"""${bpeChain(nMerges, wordpiece)}
       SELECT * FROM ($unions) u ORDER BY merge_idx"""
  }

  /** The integer-BM25 top-10 — the oracle for BOTH q103 (direct
    * two-pass scoring) and q124 (served from the inverted index + norms
    * artifacts, which must be bit-identical).
    */
  private lazy val bm25Oracle: String =
    s"""WITH d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(toks)) AS BIGINT) AS tot FROM d),
       stats AS (SELECT n, tot * 1000 // n AS avgdl_m FROM st),
       tf AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok,
                CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM d)
              WHERE tok IN ('dup', 'vector', 'merge') GROUP BY 1, 2, 3),
       df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       scored AS (
         SELECT tf.doc_id,
           (((stats.n - df.df) * 1000000 // (df.df + 1)) * (tf.tf * 2200))
             // (tf.tf * 1000 + (300 + (900 * tf.dl * 1000) // stats.avgdl_m))
             AS term_score
         FROM tf JOIN df USING (tok) CROSS JOIN stats),
       agg AS (SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score
               FROM scored GROUP BY doc_id)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         doc_id, score
       FROM agg ORDER BY score DESC, doc_id LIMIT 10"""

  /** TF-IDF ltn replay: the BM25 chain's tf/df/n machinery with the
    * dampening dropped — `score = Σ tf·idf_u`.
    */
  private lazy val tfidfOracle: String =
    s"""WITH d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
       tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
              WHERE tok IN ('dup', 'vector', 'merge') GROUP BY 1, 2),
       df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       agg AS (
         SELECT tf.doc_id,
           CAST(SUM(tf.tf * ((st.n - df.df) * 1000000 // (df.df + 1))) AS BIGINT) AS score
         FROM tf JOIN df USING (tok) CROSS JOIN st GROUP BY tf.doc_id)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         doc_id, score
       FROM agg ORDER BY score DESC, doc_id LIMIT 10"""

  /** Batch-BM25 replay: a queries CTE unnested to (query_id, tok), the
    * q103 scoring arithmetic per (query, doc), per-query top-k.
    */
  private lazy val bm25BatchOracle: String =
    s"""WITH queries AS (
         SELECT 1 AS query_id, ['dup', 'vector'] AS terms
         UNION ALL SELECT 2, ['merge']
         UNION ALL SELECT 3, ['dup', 'vector', 'merge']
       ), qt AS (
         SELECT CAST(query_id AS BIGINT) AS query_id, unnest(list_distinct(terms)) AS tok
         FROM queries
       ), d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(toks)) AS BIGINT) AS tot FROM d),
       stats AS (SELECT n, tot * 1000 // n AS avgdl_m FROM st),
       tf AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok,
                CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM d)
              WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY 1, 2, 3),
       df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       scored AS (
         SELECT qt.query_id, tf.doc_id,
           CAST(SUM((((stats.n - df.df) * 1000000 // (df.df + 1)) * (tf.tf * 2200))
             // (tf.tf * 1000 + (300 + (900 * tf.dl * 1000) // stats.avgdl_m)))
             AS BIGINT) AS score
         FROM tf JOIN df USING (tok) JOIN qt USING (tok) CROSS JOIN stats
         GROUP BY 1, 2),
       ranked AS (
         SELECT query_id, doc_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
         FROM scored)
       SELECT query_id, rnk, doc_id, score
       FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""

  /** The per-source quality percent_rank chain — q144 reads all of
    * `pct`, q145 is the same chain + one threshold.
    */
  private lazy val qualityPctCtes: String = {
    val tok = tokens("text")
    val nTok = s"len($tok)"
    val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
    val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
    val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
    val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
    val stopScore = s"least(1.0, $stopRatio * 5.0)"
    val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
    val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
    val quality = s"round(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore, 6)"
    s"""WITH scored AS (
         SELECT doc_id, source,
           CAST(floor($quality * 1000000 + 0.5) AS BIGINT) AS score_micro
         FROM documents
       ), hist AS (
         SELECT source, score_micro, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM scored GROUP BY 1, 2
       ), ranks AS (
         SELECT source, score_micro,
           CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY score_micro) - cnt AS BIGINT)
             AS n_less,
           CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT)
             AS n_le
         FROM hist
       ), totals AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY 1
       ), pct AS (
         SELECT s.doc_id, s.source, s.score_micro, n_le, n,
           CAST(n_less * 1000000 // greatest(n - 1, 1) AS BIGINT) AS pct_micro
         FROM scored s
         JOIN ranks r ON r.source = s.source AND r.score_micro = s.score_micro
         JOIN totals t ON t.source = s.source
       )"""
  }

  /** The unigram-LM tokenizer replay (q152/q153): seed-substring
    * inventory, one Viterbi pass per model (positions UNROLLED to
    * `cap` MATERIALIZED CTEs — each position references its predecessor
    * twice, so plain CTEs would inline 2^cap scans: the q138/q111
    * lesson), count re-estimation + prune, and the final segmentation.
    * The DP score is the double product `best[j−L] · num/N` in the SAME
    * operation order as the Spark trainer (divide, then multiply), ties
    * to the longer piece — the argmax at every (word, position) is
    * unique, so `ROW_NUMBER` here and `max(struct)` there pick the same
    * row.
    */
  private def unigramChain(seedSize: Int, targetSize: Int, maxPieceLen: Int, cap: Int): String = {
    val sep = "chr(31)"
    def dp(tag: String, piecesCte: String, nCte: String): String = {
      def pos(t: Int): String = {
        val lMax = math.min(maxPieceLen, t)
        s""", $tag$t AS MATERIALIZED (
             SELECT * FROM $tag${t - 1}
             UNION ALL
             SELECT w, $t AS j, score, seg FROM (
               SELECT c.w,
                 prev.score * (CAST(p.num AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS score,
                 prev.seg || $sep || c.piece AS seg,
                 ROW_NUMBER() OVER (PARTITION BY c.w
                   ORDER BY prev.score * (CAST(p.num AS DOUBLE) / CAST(nn.n AS DOUBLE)) DESC,
                     c.L DESC) AS rn
               FROM (
                 SELECT w, L, substring(w, $t - L + 1, CAST(L AS INTEGER)) AS piece,
                   $t - L AS jprev
                 FROM words, unnest(range(1, $lMax + 1)) AS ul(L)
                 WHERE length(w) >= $t
               ) c
               JOIN $piecesCte p ON p.s = c.piece
               JOIN $tag${t - 1} prev ON prev.w = c.w AND prev.j = c.jprev
               CROSS JOIN $nCte nn
             ) st$tag$t WHERE rn = 1
           )"""
      }
      s""", ${tag}0 AS (SELECT w, CAST(0 AS BIGINT) AS j, CAST(1.0 AS DOUBLE) AS score, '' AS seg FROM words)""" +
        (1 to cap).map(pos).mkString
    }
    s"""WITH words AS (
         SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
           SELECT unnest(${tokens("text")}) AS w FROM documents) t0
         WHERE length(w) > 0 GROUP BY w
       ), sub AS (
         SELECT s, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
           SELECT cnt, substring(w, CAST(i AS INTEGER), CAST(L AS INTEGER)) AS s
           FROM words,
             unnest(range(1, length(w) + 1)) AS ui(i),
             unnest(range(1, $maxPieceLen + 1)) AS ul(L)
           WHERE i + L - 1 <= length(w)) ts GROUP BY 1
       ), p0 AS (
         SELECT s, freq AS num FROM sub WHERE length(s) = 1
         UNION ALL
         SELECT s, freq AS num FROM (
           SELECT s, freq FROM sub WHERE length(s) >= 2
           ORDER BY freq DESC, s LIMIT $seedSize) tm
       ), n0 AS (SELECT CAST(SUM(num) AS BIGINT) AS n FROM p0)${dp("a", "p0", "n0")},
       segA AS (
         SELECT a.w, words.cnt, string_split(substr(a.seg, 2), $sep) AS syms
         FROM a$cap a JOIN words ON words.w = a.w AND a.j = length(a.w)
       ), cnts AS (
         SELECT s, CAST(SUM(cnt) AS BIGINT) AS c FROM (
           SELECT cnt, unnest(syms) AS s FROM segA) tc GROUP BY 1
       ), p1 AS (
         SELECT s0.s, CAST(COALESCE(c.c, 0) + 1 AS BIGINT) AS num
         FROM (SELECT s FROM sub WHERE length(s) = 1) s0
         LEFT JOIN cnts c ON c.s = s0.s
         UNION ALL
         SELECT s, CAST(c + 1 AS BIGINT) AS num FROM (
           SELECT s, c FROM cnts WHERE length(s) >= 2
           ORDER BY c DESC, s LIMIT $targetSize) tm1
       ), n1 AS (SELECT CAST(SUM(num) AS BIGINT) AS n FROM p1)${dp("b", "p1", "n1")},
       segB AS (
         SELECT b.w, words.cnt, string_split(substr(b.seg, 2), $sep) AS syms
         FROM b$cap b JOIN words ON words.w = b.w AND b.j = length(b.w)
       )"""
  }

  /** The classifier replay chain (q150/q151): labeled feature buckets,
    * class totals, and the COMPLETE numBuckets-row normalized-ratio
    * weight table. HUGEINT products mirror the engine's decimal(38,0).
    */
  private lazy val classifierCtes: String = {
    val b = graft.operators.Importance.DefaultBuckets
    s"""WITH fb AS (
         SELECT doc_id, doc_id % 3 AS cls,
           unnest(${positionalShingleHashes("text", 1)}) % $b AS b
         FROM documents
       ),
       pcnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS pc FROM fb WHERE cls = 0 GROUP BY 1),
       ncnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nc FROM fb WHERE cls = 1 GROUP BY 1),
       tot AS (
         SELECT CAST((SELECT COALESCE(SUM(pc), 0) FROM pcnt) AS BIGINT) AS np,
           CAST((SELECT COALESCE(SUM(nc), 0) FROM ncnt) AS BIGINT) AS nn
       ),
       w AS (
         SELECT r.b,
           CAST((CAST(COALESCE(pc, 0) + 1 AS HUGEINT) * (nn + $b) * 1000000)
             // (CAST(COALESCE(nc, 0) + 1 AS HUGEINT) * (np + $b)) AS BIGINT) AS w
         FROM range(0, $b) AS r(b)
         LEFT JOIN pcnt ON pcnt.b = r.b
         LEFT JOIN ncnt ON ncnt.b = r.b
         CROSS JOIN tot
       )"""
  }

  /** The language-ID replay chain (q148/q149): per-language conditional
    * char-trigram counts trained on the even-id slice, candidates
    * (filtered by `candWhere`) scored by integer rarity per language and
    * assigned by (rarity_avg, lang) argmin. Ends at
    * `pick (doc_id, lang_pred, rarity_avg)`.
    */
  private def langIdCtes(candWhere: String): String = {
    val cg1 = charGramHashes("text", 1)
    val cg2 = charGramHashes("text", 2)
    val cg3 = charGramHashes("text", 3)
    s"""WITH tr AS (SELECT lang, text FROM documents WHERE doc_id % 2 = 0),
       tb AS (SELECT lang, $cg2 AS g2, $cg3 AS g3 FROM tr),
       tp AS (SELECT lang, g2[i] AS p, g3[i] AS g
              FROM tb, unnest(range(1, len(g3) + 1)) AS u(i)),
       grams AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c FROM tp GROUP BY 1, 2),
       prefixes AS (SELECT lang, p, CAST(COUNT(*) AS BIGINT) AS cp FROM tp GROUP BY 1, 2),
       vocab AS (
         SELECT lang, CAST(COUNT(DISTINCT u1) AS BIGINT) AS v
         FROM (SELECT lang, unnest($cg1) AS u1 FROM tr) q0 GROUP BY 1
       ),
       cand AS (SELECT doc_id, text FROM documents WHERE $candWhere),
       cb AS (SELECT doc_id, $cg2 AS g2, $cg3 AS g3 FROM cand),
       cpair AS (SELECT doc_id, g2[i] AS p, g3[i] AS g
                 FROM cb, unnest(range(1, len(g3) + 1)) AS u(i)),
       sc AS (
         SELECT doc_id, v.lang,
           ((COALESCE(pf.cp, 0) + v.v) * 1000000)
             // (COALESCE(gm.c, 0) + 1) AS rarity
         FROM cpair
         CROSS JOIN vocab v
         LEFT JOIN grams gm ON gm.lang = v.lang AND gm.g = cpair.g
         LEFT JOIN prefixes pf ON pf.lang = v.lang AND pf.p = cpair.p
       ),
       per AS (
         SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(rarity) // COUNT(*) AS BIGINT) AS rarity_avg
         FROM sc GROUP BY 1, 2
       ),
       pick AS (
         SELECT doc_id, lang AS lang_pred, rarity_avg FROM (
           SELECT doc_id, lang, rarity_avg,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rarity_avg, lang) AS rn
           FROM per) t0
         WHERE rn = 1
       )"""
  }

  /** The multi-probe LSH replay — the oracle for BOTH q31 (buckets
    * in-plan) and q129 (served from the persisted bucket artifact,
    * which must be bit-identical: the signature is row-local).
    */
  private lazy val annLshOracle: String = {
    val L = Similarity.LshTables
    val w = Similarity.LshPlanesPerTable
    val buckets = lshBucketsList("embedding", L, w, Similarity.Dim)
    val masks = Similarity.probeMasks(w).mkString("[", ", ", "]")
    s"""WITH b AS (SELECT vec_id, embedding, $buckets AS buckets FROM embeddings),
       bt AS (
         SELECT vec_id, embedding, t, buckets[t+1] AS bucket
         FROM b, unnest(range(0, $L)) AS tt(t)
       ), qp AS (
         SELECT vec_id, embedding, t, xor(bucket, m) AS probe
         FROM bt, unnest($masks) AS mm(m)
         WHERE vec_id < 5
       ), cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${cosine("q.embedding", "c.embedding")} AS cos
         FROM qp q JOIN bt c
           ON q.t = c.t AND q.probe = c.bucket AND q.vec_id <> c.vec_id
       ), ranked AS (
         SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM cand
       )
       SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
       FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
  }

  /** The IVF trainer + search replay — the oracle for BOTH q37 (train
    * in-plan) and q125 (served from the persisted codebook/assignment
    * artifacts, which must be bit-identical).
    */
  private lazy val annIvfOracle: String = {
    val p = Similarity.IvfProbes
    s"""WITH ${ivfTrainerCtes(annCellsSql)}, scores AS (
         SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
         FROM embeddings e CROSS JOIN $ivfFinalCent ct
       ), ranked_cells AS (
         SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
         FROM scores
       ), assign1 AS (
         SELECT vec_id, cell FROM ranked_cells WHERE r = 1
       ), probes AS (
         SELECT vec_id, cell FROM ranked_cells WHERE r <= $p AND vec_id < 5
       ), cand AS (
         SELECT DISTINCT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
           ${cosine("qe.embedding", "ce.embedding")} AS cos
         FROM probes pr
         JOIN assign1 a ON pr.cell = a.cell AND pr.vec_id <> a.vec_id
         JOIN embeddings qe ON qe.vec_id = pr.vec_id
         JOIN embeddings ce ON ce.vec_id = a.vec_id
       ), ranked AS (
         SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM cand
       )
       SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
       FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
  }

  /** PCA replay: micro-quantize, offset-trick centering, the exact
    * HUGEINT second-moment matrix, then `iters` UNROLLED power rounds —
    * each a matvec + the offset normalization (every division's
    * numerator kept non-negative so floored and truncating division
    * agree) — and the centered projection.
    */
  private def pcaOracle(iters: Int): String =
    s"""${pcaCtes(iters)}
       SELECT cen.vec_id, CAST(SUM(c * v) AS BIGINT) AS proj
       FROM cen JOIN v$iters vv ON vv.j = cen.j
       GROUP BY cen.vec_id ORDER BY cen.vec_id"""

  /** All-but-the-top replay: the same chain, then the fixed-order
    * double correction `c − proj·v/vv` per (vector, component).
    */
  private def pcaRemoveOracle(iters: Int): String =
    s"""${pcaCtes(iters)}, vvn AS (SELECT SUM(v * v) AS vv FROM v$iters),
       pr AS (
         SELECT cen.vec_id, CAST(SUM(c * v) AS BIGINT) AS proj
         FROM cen JOIN v$iters vt ON vt.j = cen.j GROUP BY 1
       )
       SELECT cen.vec_id, cen.j,
         round(CAST(c AS DOUBLE)
           - CAST(proj AS DOUBLE) * CAST(v AS DOUBLE) / CAST(vv AS DOUBLE), 6) AS resid
       FROM cen
       JOIN v$iters vt ON vt.j = cen.j
       JOIN pr ON pr.vec_id = cen.vec_id, vvn
       ORDER BY cen.vec_id, cen.j"""

  private def pcaCtes(iters: Int): String = {
    val S = graft.operators.Spectral.Scale
    // MATERIALIZED throughout: DuckDB inlines plain CTEs, and 12 rounds
    // each referencing cov→cen→xu would expand to 3^12 file scans (the
    // bpeChain lesson — this oracle actually hit EMFILE without it)
    def round(t: Int): String =
      s""", w$t AS MATERIALIZED (
           SELECT c.j, SUM(c.s * v.v) AS w FROM cov c
           JOIN v${t - 1} v ON v.j = c.k GROUP BY 1
         ), s$t AS MATERIALIZED (SELECT MAX(abs(w)) AS smax FROM w$t),
         v$t AS MATERIALIZED (
           SELECT j, CAST((w + smax) * $S // (2 * greatest(smax, 1)) - ${S / 2} AS BIGINT) AS v
           FROM w$t, s$t
         )"""
    s"""WITH xu AS MATERIALIZED (
         SELECT vec_id, CAST(j AS BIGINT) AS j,
           CAST(floor(CAST(x AS DOUBLE) * $S + 0.5) AS BIGINT) AS xu
         FROM (SELECT vec_id, unnest(embedding) AS x,
                 unnest(range(len(embedding))) AS j
               FROM embeddings) t0
       ), means AS MATERIALIZED (
         SELECT j, CAST(sum(xu + $S) // count(*) - $S AS BIGINT) AS m
         FROM xu GROUP BY j
       ), cen AS MATERIALIZED (
         SELECT vec_id, xu.j, xu - m AS c FROM xu JOIN means USING (j)
       ), cov AS MATERIALIZED (
         SELECT a.j AS j, b.j AS k, SUM(CAST(a.c * b.c AS HUGEINT)) AS s
         FROM cen a JOIN cen b USING (vec_id) GROUP BY 1, 2
       ), v0 AS MATERIALIZED (
         SELECT j, (${remix32("j")} % 2001 - 1000) AS v
         FROM (SELECT DISTINCT j FROM cov) tj
       )${(1 to iters).map(round).mkString}"""
  }

  /** MMR replay: the brute pool then `k` UNROLLED selection rounds —
    * candidate = pool minus selected, penalty = max candidate-selected
    * cosine, all scores quantized to integer micro-units
    * (`floor(x·10⁶ + 0.5)` on identical IEEE doubles) so the argmax is
    * bit-determined; the combined score stays the UNDIVIDED nano-unit
    * integer (the first cut ranked raw doubles and a sub-1e-6 tie
    * flipped a round-3 pick between engines).
    */
  private def mmrOracle(k: Int, poolK: Int, lambdaMilli: Int): String = {
    val om = 1000 - lambdaMilli
    def q(x: String) = s"CAST(floor(($x) * 1000000 + 0.5) AS BIGINT)"
    def round(r: Int): String = {
      val prev = s"sel${r - 1}"
      val mmr = s"$lambdaMilli * c.rel_u - $om * COALESCE(p.pen_u, CAST(0 AS BIGINT))"
      s""", cand$r AS (
           SELECT p.query_id, p.neighbor_id, p.rel_u FROM pool p
           WHERE NOT EXISTS (SELECT 1 FROM $prev s
             WHERE s.query_id = p.query_id AND s.neighbor_id = p.neighbor_id)
         ), pen$r AS (
           SELECT c.query_id, c.neighbor_id,
             MAX(${q(cosine("ce.embedding", "se.embedding"))}) AS pen_u
           FROM cand$r c
           JOIN $prev s ON s.query_id = c.query_id
           JOIN embeddings ce ON ce.vec_id = c.neighbor_id
           JOIN embeddings se ON se.vec_id = s.neighbor_id
           GROUP BY 1, 2
         ), pick$r AS (
           SELECT query_id, CAST($r AS BIGINT) AS rnk, neighbor_id, mmr_nano FROM (
             SELECT c.query_id, c.neighbor_id,
               CAST($mmr AS BIGINT) AS mmr_nano,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                 ORDER BY ($mmr) DESC, c.neighbor_id) AS rr
             FROM cand$r c LEFT JOIN pen$r p
               ON p.query_id = c.query_id AND p.neighbor_id = c.neighbor_id) t
           WHERE rr = 1
         ), sel$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM pick$r)"""
    }
    s"""WITH bq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
       bscored AS (
         SELECT bq.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${cosine("bq.embedding", "c.embedding")} AS cos
         FROM bq JOIN embeddings c ON bq.vec_id <> c.vec_id
       ), branked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS rnk
         FROM bscored
       ), pool AS (
         SELECT query_id, neighbor_id, ${q("round(cos, 6)")} AS rel_u
         FROM branked WHERE rnk <= $poolK
       ), sel1 AS (
         SELECT query_id, CAST(1 AS BIGINT) AS rnk, neighbor_id, mmr_nano FROM (
           SELECT query_id, neighbor_id,
             CAST($lambdaMilli * rel_u AS BIGINT) AS mmr_nano,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY ($lambdaMilli * rel_u) DESC, neighbor_id) AS rr
           FROM pool) t WHERE rr = 1
       )${(2 to k).map(round).mkString}
       SELECT query_id, rnk, neighbor_id, mmr_nano
       FROM sel$k ORDER BY query_id, rnk"""
  }

  /** The fresh-tail IVF serve replay: the trainer chain runs over the
    * INDEXED 90% (`half` CTE — the oracle's src knob), candidates are
    * the probed-cell set over that half UNION an exhaustive scan of the
    * un-indexed tail, ranked once.
    */
  private lazy val annIvfFreshOracle: String = {
    val p = Similarity.IvfProbes
    s"""WITH half AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 9),
       ${ivfTrainerCtes(annCellsSql, src = "half")}, scores AS (
         SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
         FROM half e CROSS JOIN $ivfFinalCent ct
       ), qscores AS (
         SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
         FROM embeddings e CROSS JOIN $ivfFinalCent ct WHERE e.vec_id < 5
       ), ranked_cells AS (
         SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
         FROM scores
       ), assign1 AS (
         SELECT vec_id, cell FROM ranked_cells WHERE r = 1
       ), probes AS (
         SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
           FROM qscores) t WHERE r <= $p
       ), icand AS (
         SELECT DISTINCT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
           ${cosine("qe.embedding", "ce.embedding")} AS cos
         FROM probes pr
         JOIN assign1 a ON pr.cell = a.cell AND pr.vec_id <> a.vec_id
         JOIN embeddings qe ON qe.vec_id = pr.vec_id
         JOIN embeddings ce ON ce.vec_id = a.vec_id
       ), fcand AS (
         SELECT q.vec_id AS query_id, te.vec_id AS neighbor_id,
           ${cosine("q.embedding", "te.embedding")} AS cos
         FROM embeddings q
         JOIN embeddings te ON te.vec_id % 10 = 9 AND q.vec_id <> te.vec_id
         WHERE q.vec_id < 5
       ), cand AS (
         SELECT * FROM icand UNION ALL SELECT * FROM fcand
       ), ranked AS (
         SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM cand
       )
       SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
       FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
  }

  /** The full-corpus inverted index as flattened posting rows — the gate
    * for BOTH q107 (direct build) and q115 (merge of two disjoint-half
    * indexes, which must equal the rebuild exactly).
    */
  private lazy val invertedIndexOracle: String =
    s"""WITH occ AS (SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents),
       tf AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
              FROM occ GROUP BY 1, 2),
       df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok)
       SELECT tok, df,
         CAST(ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) - 1 AS BIGINT) AS pos,
         doc_id, tf
       FROM tf JOIN df USING (tok) ORDER BY tok, pos"""

  /** The q82 hygienic chain — scrub → Gopher → quality → repetition →
    * decontamination → exact dedup → near dedup (best-rep) → temperature
    * mix — as a CTE sequence `raw … samp` over the documents table with
    * the fixture's 9/1 content-hash corpus/benchmark split. ONE source of
    * truth for the pipeline gate (q82 packs `samp`) and the attrition
    * gate (q109 counts every stage boundary): the stage order and every
    * threshold live here, once. Embed inside `WITH RECURSIVE` (the
    * cluster chain's `reach` member is recursive).
    */
  private lazy val hygienicChainCtes: String = {
    val tok = tokens("text")
    val nTok = s"len($tok)"
    val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
    val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
    val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
    val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
    val stopScore = s"least(1.0, $stopRatio * 5.0)"
    val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
    val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
    val quality = s"(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore)"
    val scrubExpr =
      s"regexp_replace(regexp_replace(text, '${TextFunctions.EmailRegex}', '<email>', 'g'), " +
        s"'${TextFunctions.LongNumberRegex}', '<num>', 'g')"
    s"""raw AS (
           SELECT doc_id, lang, text, (${polyHash("text")} % 10) AS bkt FROM documents
         ), scrubbed AS (
           SELECT doc_id, lang, $scrubExpr AS text FROM raw WHERE bkt < 9
         ), benchs AS (
           SELECT $scrubExpr AS text FROM raw WHERE bkt >= 9
         ), bgrams AS (
           SELECT DISTINCT unnest(${shingleHashesDistinct("text", 4)}) AS gh FROM benchs
         ), gph AS (
           SELECT doc_id, lang, text FROM scrubbed
           WHERE ${gopherKeepPredicate("text")}
         ), qual AS (
           SELECT doc_id, lang, text FROM gph WHERE $quality >= 0.4275
         ), repg AS (
           SELECT doc_id, gh, COUNT(*) AS c FROM (
             SELECT doc_id, unnest(${positionalShingleHashes("text", 2)}) AS gh FROM qual
           ) g0 GROUP BY 1, 2
         ), repk AS (
           SELECT doc_id FROM (
             SELECT doc_id, SUM(c) AS ng, COUNT(*) AS nd, MAX(c) AS tc
             FROM repg GROUP BY 1) rs
           WHERE round(1.0 - CAST(nd AS DOUBLE) / CAST(ng AS DOUBLE), 6) <= 0.3
             AND round(CAST(tc AS DOUBLE) / CAST(ng AS DOUBLE), 6) <= 0.2
         ), nonrep AS (
           SELECT qual.doc_id, qual.lang, qual.text FROM qual JOIN repk USING (doc_id)
         ), cont AS (
           SELECT DISTINCT doc_id FROM (
             SELECT doc_id, unnest(${shingleHashesDistinct("text", 4)}) AS gh FROM nonrep
           ) cg JOIN bgrams USING (gh)
         ), cleand AS (
           SELECT nonrep.doc_id, nonrep.lang, nonrep.text FROM nonrep
           WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         ), ex AS (
           SELECT MIN(doc_id) AS doc_id FROM cleand GROUP BY text
         ), exd AS (
           SELECT cleand.doc_id, cleand.lang, cleand.text FROM cleand JOIN ex USING (doc_id)
         ), ${clusterChain("exd")}, scored AS (
           SELECT doc_id, round($quality, 6) AS score FROM exd
         ), ranked AS (
           SELECT c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY s.score DESC, c.doc_id) AS rn
           FROM cc c JOIN scored s ON c.doc_id = s.doc_id
         ), surv AS (
           SELECT exd.doc_id, exd.lang, exd.text
           FROM exd JOIN ranked ON exd.doc_id = ranked.doc_id AND ranked.rn = 1
         ), lc AS (
           SELECT lang, COUNT(*) AS n_g FROM surv GROUP BY 1
         ), lm AS (
           SELECT MIN(n_g) AS n_min FROM lc
         ), lthr AS (
           SELECT lang,
             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS DOUBLE))
               * 1000000.0) AS BIGINT) AS thr
           FROM lc, lm
         ), samp AS (
           SELECT surv.doc_id, surv.lang, surv.text
           FROM surv JOIN lthr ON surv.lang IS NOT DISTINCT FROM lthr.lang
           WHERE (${polyHash("surv.text")} % 1000000) < thr
         )"""
  }

  /** q101: the serving side — per-doc word/subword counts by joining the
    * final segmentation table `s{nMerges}` (inner join: every corpus
    * word is in the table it trained, which is the gated case).
    */
  private def bpeProfileOracle(nMerges: Int): String =
    s"""${bpeChain(nMerges)}, prof AS (
         SELECT doc_id, w FROM (
           SELECT doc_id, unnest(${tokens("text")}) AS w FROM documents) t00
         WHERE length(w) > 0
       )
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(len(s$nMerges.syms)) AS BIGINT) AS n_subwords
       FROM prof JOIN s$nMerges USING (w)
       GROUP BY 1 ORDER BY doc_id"""

  /** Tokenizer serving replay: the q100 trainer chain, the mass-ranked
    * symbol vocabulary off its final segmentation table, and the per-doc
    * ordered flatten — reading-order position via a (wpos, spos) window.
    * No char-fallback branch: the gate encodes the TRAINING corpus, so
    * every word is in the table (the fallback law lives in CorpusOpsSpec).
    */
  private def bpeEncodeCtes(nMerges: Int): String =
    s"""${bpeChain(nMerges)}, vocab AS (
         SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY mass DESC, sym) AS BIGINT) AS sym_id
         FROM (SELECT sym, CAST(SUM(cnt) AS BIGINT) AS mass FROM (
           SELECT cnt, unnest(syms) AS sym FROM s$nMerges) tv GROUP BY 1) tm
       ), wocc AS (
         SELECT doc_id, wpos, w FROM (
           SELECT doc_id, unnest(range(0, len(ws))) AS wpos, unnest(ws) AS w
           FROM (SELECT doc_id, ${tokens("text")} AS ws FROM documents) t00) t01
         WHERE length(w) > 0
       ), socc AS (
         SELECT doc_id, wpos, spos, sym FROM (
           SELECT doc_id, wpos, unnest(range(0, len(syms))) AS spos, unnest(syms) AS sym
           FROM wocc JOIN s$nMerges USING (w)) t02
       ), enc AS (
         SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1 AS BIGINT) AS pos,
           vocab.sym_id
         FROM socc JOIN vocab USING (sym)
       )"""

  private def bpeEncodeOracle(nMerges: Int): String =
    s"""${bpeEncodeCtes(nMerges)}
       SELECT doc_id, pos, sym_id FROM enc ORDER BY doc_id, pos"""

  /** The flattened view of [[graft.operators.SequencePack.chunkIds]] is
    * pure position arithmetic over the encoded stream.
    */
  private def packIdsOracle(nMerges: Int, seqLen: Int): String =
    s"""${bpeEncodeCtes(nMerges)}
       SELECT doc_id, pos // $seqLen AS chunk_idx, pos % $seqLen AS pos, sym_id
       FROM enc ORDER BY doc_id, chunk_idx, pos"""

  /** WordPiece-runtime replay: the trainer chain (wordpiece scoring)
    * yields the symbol inventory; the greedy longest-match walk is a
    * LINEAR recursion — the step at each (word, position) is unique
    * (the max-length match), so the recursive CTE follows one path per
    * word with strictly-increasing positions.
    */
  private def greedyEncodeOracle(nMerges: Int, maxPieceLen: Int): String = {
    val chain = bpeChain(nMerges, wordpiece = true).replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$chain, vocab AS (
         SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY mass DESC, sym) AS BIGINT) AS sym_id
         FROM (SELECT sym, CAST(SUM(cnt) AS BIGINT) AS mass FROM (
           SELECT cnt, unnest(syms) AS sym FROM s$nMerges) tv GROUP BY 1) tm
       ), steps AS (
         SELECT t.w, t.p, MAX(length(v.sym)) AS step
         FROM (SELECT w, unnest(range(0, length(w))) AS p FROM s$nMerges) t
         JOIN vocab v ON length(v.sym) <= $maxPieceLen
           AND substr(t.w, CAST(t.p + 1 AS INTEGER), CAST(length(v.sym) AS INTEGER)) = v.sym
         GROUP BY t.w, t.p
       ), walk(w, pos, k) AS (
         SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM s$nMerges
         UNION ALL
         SELECT wk.w, wk.pos + st.step, wk.k + 1
         FROM walk wk JOIN steps st ON st.w = wk.w AND st.p = wk.pos
         WHERE wk.pos < length(wk.w)
       ), gseg AS (
         SELECT wk.w, wk.k AS spos,
           substr(wk.w, CAST(wk.pos + 1 AS INTEGER), CAST(st.step AS INTEGER)) AS sym
         FROM walk wk JOIN steps st ON st.w = wk.w AND st.p = wk.pos
         WHERE wk.pos < length(wk.w)
       ), wocc AS (
         SELECT doc_id, wpos, w FROM (
           SELECT doc_id, unnest(range(0, len(ws))) AS wpos, unnest(ws) AS w
           FROM (SELECT doc_id, ${tokens("text")} AS ws FROM documents) t00) t01
         WHERE length(w) > 0
       ), socc AS (
         SELECT doc_id, wpos, spos, sym FROM wocc JOIN gseg USING (w)
       ), genc AS (
         SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1 AS BIGINT)
             AS pos,
           vocab.sym_id
         FROM socc JOIN vocab USING (sym)
       )
       SELECT doc_id, pos, sym_id FROM genc ORDER BY doc_id, pos"""
  }

  /** Count-Min replay: the counter grid is a pure function of the token
    * multiset through the minhash affine row-hash family, so DuckDB
    * rebuilds every cell and reads the same minima.
    */
  private def cmsOracle(depth: Int, width: Int): String = {
    val P = graft.functions.Kernels.HashPrime
    def cellOf(h: String): String =
      s"((($h)*(2*r+1) + (r*r*31+7) % $P) % $P) % $width"
    s"""WITH occ AS (
         SELECT t.tok
         FROM documents, unnest(${OracleFragments.positionalShingles("text", 2)}) AS t(tok)
       ), hh AS (SELECT tok, ${OracleFragments.polyHash("tok")} AS h FROM occ),
       cells AS (
         SELECT r, ${cellOf("h")} AS c, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM hh, unnest(range(0, $depth)) AS rr(r)
         GROUP BY 1, 2
       ), keys AS (SELECT DISTINCT tok, h FROM hh),
       probes AS (
         SELECT k.tok, r, ${cellOf("k.h")} AS c
         FROM keys k, unnest(range(0, $depth)) AS rr(r)
       )
       SELECT p.tok, min(cells.cnt) AS est
       FROM probes p JOIN cells ON cells.r = p.r AND cells.c = p.c
       GROUP BY p.tok ORDER BY p.tok"""
  }

  /** Metrics replay: the LSH run (q31's chain) joined against the
    * brute-force truth (q30's chain), then the integer fixed-point
    * metric arithmetic — DuckDB `//` is floored division on the
    * non-negative operands exactly like Spark's `div`.
    */
  private lazy val rankMetricsOracle: String = {
    val L = Similarity.LshTables
    val w = Similarity.LshPlanesPerTable
    val buckets = lshBucketsList("embedding", L, w, Similarity.Dim)
    val masks = Similarity.probeMasks(w).mkString("[", ", ", "]")
    s"""WITH lb AS (SELECT vec_id, embedding, $buckets AS buckets FROM embeddings),
       lbt AS (
         SELECT vec_id, embedding, t, buckets[t+1] AS bucket
         FROM lb, unnest(range(0, $L)) AS tt(t)
       ), lqp AS (
         SELECT vec_id, embedding, t, xor(bucket, m) AS probe
         FROM lbt, unnest($masks) AS mm(m)
         WHERE vec_id < 5
       ), lcand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${cosine("q.embedding", "c.embedding")} AS cos
         FROM lqp q JOIN lbt c
           ON q.t = c.t AND q.probe = c.bucket AND q.vec_id <> c.vec_id
       ), lrun AS (
         SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM lcand
       ), run AS (SELECT query_id, neighbor_id, rnk FROM lrun WHERE rnk <= 10),
       bq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
       bscored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${cosine("q.embedding", "c.embedding")} AS cos
         FROM bq q JOIN embeddings c ON q.vec_id <> c.vec_id
       ), brun AS (
         SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         FROM bscored
       ), truth AS (SELECT query_id, neighbor_id FROM brun WHERE rnk <= 10),
       hits AS (
         SELECT r.query_id, r.rnk,
           CAST(ROW_NUMBER() OVER (PARTITION BY r.query_id ORDER BY r.rnk) AS BIGINT)
             AS hits_upto
         FROM run r JOIN truth t2
           ON r.query_id = t2.query_id AND r.neighbor_id = t2.neighbor_id
       ), per AS (
         SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits, MIN(rnk) AS first_hit,
           CAST(SUM(hits_upto * 1000000 // rnk) AS BIGINT) AS ap_num,
           CAST(SUM(($ndcgGains)[rnk]) AS BIGINT) AS dcg_num
         FROM hits GROUP BY query_id
       ),
       nret AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ret FROM run GROUP BY query_id),
       nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM truth GROUP BY query_id)
       SELECT nret.query_id, n_ret,
         COALESCE(n_rel, CAST(0 AS BIGINT)) AS n_rel,
         COALESCE(hits, CAST(0 AS BIGINT)) AS hits,
         CAST(COALESCE(hits, 0) * 1000 // least(10, n_ret) AS BIGINT) AS prec_milli,
         CAST(COALESCE(hits, 0) * 1000 // greatest(COALESCE(n_rel, 0), 1) AS BIGINT)
           AS rec_milli,
         CAST(CASE WHEN first_hit IS NULL THEN 0 ELSE 1000000 // first_hit END AS BIGINT)
           AS rr_micro,
         CAST(COALESCE(ap_num, 0) // greatest(COALESCE(n_rel, 0), 1) AS BIGINT) AS ap_micro,
         CAST(CASE WHEN COALESCE(n_rel, 0) = 0 OR dcg_num IS NULL THEN 0
           ELSE dcg_num * 1000000 // ($ndcgIdcgs)[least(n_rel, 10)] END AS BIGINT)
           AS ndcg_micro
       FROM nret LEFT JOIN nrel USING (query_id) LEFT JOIN per USING (query_id)
       ORDER BY query_id"""
  }

  /** The q133 nDCG literal tables — the SAME `Retrieval.ndcgGainLut`
    * numbers the Spark plan embeds, as DuckDB list literals (1-indexed
    * by rank).
    */
  private lazy val ndcgGains: String =
    graft.operators.Retrieval.ndcgGainLut(10).mkString("[", ", ", "]")
  private lazy val ndcgIdcgs: String =
    graft.operators.Retrieval.ndcgIdcgLut(10).mkString("[", ", ", "]")

  /** The cross-document replay is the same arithmetic over the GLOBAL
    * stream position: each doc's ids then its EOS sentinel, in doc_id
    * order, numbered once — `(gpos div L, gpos mod L)`.
    */
  private def packAcrossOracle(nMerges: Int, seqLen: Int, eosId: Long): String =
    s"""${bpeEncodeCtes(nMerges)}, stream AS (
         SELECT doc_id, pos, sym_id FROM enc
         UNION ALL
         SELECT doc_id, 1 + max(pos) AS pos, CAST($eosId AS BIGINT) AS sym_id
         FROM enc GROUP BY doc_id
       ), g AS (
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id, pos) - 1 AS BIGINT) AS gpos, sym_id
         FROM stream
       )
       SELECT gpos // $seqLen AS chunk_idx, gpos % $seqLen AS pos, sym_id
       FROM g ORDER BY chunk_idx, pos"""

  /** The Mondrian cut loop unrolled into `rounds` materialized CTE
    * blocks (the q138/q111 lesson: each round's state is referenced
    * more than once — plain CTEs would inline 2^rounds scans). A
    * no-cut round is the identity (empty `cu{r}` ⇒ LEFT join keeps
    * pids), so the fixed unroll replays the Scala loop's early exit
    * exactly.
    */
  private def mondrianOracle(k: Long, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH s0 AS MATERIALIZED (
           SELECT c_custkey, CAST(floor(c_acctbal/1000.0) AS BIGINT) AS a,
                  CAST(c_nationkey AS BIGINT) AS b, CAST(0 AS BIGINT) AS pid
           FROM customer)"""
    )
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        h$r AS MATERIALIZED (
          SELECT pid, 0 AS attr, a AS band, COUNT(*) AS bn FROM s$p GROUP BY 1, 3
          UNION ALL
          SELECT pid, 1 AS attr, b AS band, COUNT(*) AS bn FROM s$p GROUP BY 1, 3),
        ch$r AS (
          SELECT pid, attr, n FROM (
            SELECT pid, attr, n, span,
              ROW_NUMBER() OVER (PARTITION BY pid ORDER BY span DESC, attr ASC) AS rk
            FROM (SELECT pid, attr, MAX(band)-MIN(band) AS span, SUM(bn) AS n
                  FROM h$r GROUP BY 1, 2))
          WHERE rk = 1 AND span > 0 AND n >= 2*$k),
        cu$r AS (
          SELECT pid, attr, cut FROM (
            SELECT pid, attr, n, MIN(band) AS cut, min_by(cum, band) AS left_n
            FROM (SELECT h.pid, h.attr, h.band, ch.n,
                    SUM(h.bn) OVER (PARTITION BY h.pid ORDER BY h.band
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                  FROM h$r h JOIN ch$r ch USING (pid, attr))
            WHERE cum*2 >= n GROUP BY pid, attr, n)
          WHERE left_n >= $k AND n - left_n >= $k),
        s$r AS MATERIALIZED (
          SELECT s.c_custkey, s.a, s.b,
            CASE WHEN cu.pid IS NULL THEN s.pid
              ELSE s.pid*2 + CASE WHEN (CASE cu.attr WHEN 0 THEN s.a ELSE s.b END) <= cu.cut
                             THEN 1 ELSE 2 END END AS pid
          FROM s$p s LEFT JOIN cu$r cu ON s.pid = cu.pid)""")
    }
    sb.append(s""",
      boxes AS (
        SELECT pid, COUNT(*) AS cell_n, MIN(a) AS a_lo, MAX(a) AS a_hi,
               MIN(b) AS b_lo, MAX(b) AS b_hi
        FROM s$rounds GROUP BY pid)
      """)
    sb.toString
  }

  private def mondrianRowOracle(k: Long, rounds: Int): String =
    mondrianOracle(k, rounds) +
      s"""SELECT s.c_custkey, s.pid, x.cell_n, x.a_lo, x.a_hi, x.b_lo, x.b_hi,
             (x.cell_n >= $k) AS ok
      FROM s$rounds s JOIN boxes x USING (pid) ORDER BY s.c_custkey"""

  /** DuckDB replay of [[graft.operators.Deidentify.dpCellCounts]] over
    * the bal-banded customer frame: the cell census, the salted-hash
    * uniform (polyHash then remix32, the q159 two-CTE shape), then the
    * geometric mechanism as `len(list_filter(LUT, t -> t <= u)) − K` —
    * the LUT's integer thresholds are computed ONCE by
    * [[graft.operators.Deidentify.dpNoiseLut]] and embedded as literals
    * in BOTH plans, so the draw replays bit-for-bit with no
    * transcendental evaluated on either side.
    */
  private def dpCountsOracle(quasiCols: Seq[String], epsilonMicro: Long, salt: String): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro)
    val lut = ts.mkString("[", ", ", "]")
    val qs = quasiCols.mkString(", ")
    val keyExpr = OracleFragments.dpCellKey(quasiCols.map(c => s"CAST($c AS VARCHAR)"), salt)
    s"""WITH g AS (
         SELECT c_mktsegment, c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
         FROM customer
       ), cells AS (
         SELECT $qs, COUNT(*) AS n FROM g GROUP BY $qs
       ), h AS (
         SELECT $qs, n,
           ${OracleFragments.polyHash(keyExpr)} AS h0
         FROM cells
       ), r AS (
         SELECT $qs, n, ${OracleFragments.remix32("h0")} AS u FROM h
       )
       SELECT $qs,
         CAST(greatest(n + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS n_dp,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro
       FROM r ORDER BY $qs"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpClosedHistogram]]
    * over the observed-marginal product domain: nations × bands cross
    * join, LEFT join of the census, COALESCE 0, then the same salted
    * uniform + LUT probe as [[dpCountsOracle]] on EVERY domain cell.
    */
  private def dpClosedHistOracle(epsilonMicro: Long, salt: String): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro)
    val lut = ts.mkString("[", ", ", "]")
    s"""WITH g AS (
         SELECT c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
         FROM customer
       ), cells AS (
         SELECT c_nationkey, bal_band, COUNT(*) AS n FROM g GROUP BY 1, 2
       ), dom AS (
         SELECT n1.c_nationkey, b1.bal_band
         FROM (SELECT DISTINCT c_nationkey FROM g) n1
         CROSS JOIN (SELECT DISTINCT bal_band FROM g) b1
       ), dense AS (
         SELECT dom.c_nationkey, dom.bal_band, COALESCE(cells.n, 0) AS n
         FROM dom LEFT JOIN cells USING (c_nationkey, bal_band)
       ), h AS (
         SELECT c_nationkey, bal_band, n,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(Seq("CAST(c_nationkey AS VARCHAR)", "bal_band"), salt)
          )} AS h0
         FROM dense
       ), r AS (
         SELECT c_nationkey, bal_band, n, ${OracleFragments.remix32("h0")} AS u FROM h
       )
       SELECT c_nationkey, bal_band,
         CAST(greatest(n + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS n_dp,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro
       FROM r ORDER BY c_nationkey, bal_band"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpCellSums]]: clamp to
    * [0, clip], per-cell sum, geometric draw at sensitivity clip (the
    * LUT built at ε/Δ), noise key salted `salt:sum:<valueCol>`.
    */
  private def dpSumsOracle(clip: Long, epsilonMicro: Long, salt: String): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro / clip)
    val lut = ts.mkString("[", ", ", "]")
    s"""WITH g AS (
         SELECT c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band,
           greatest(least(c_custkey % 13, $clip), 0) AS v
         FROM customer
       ), cells AS (
         SELECT c_nationkey, bal_band, CAST(SUM(v) AS BIGINT) AS s
         FROM g GROUP BY 1, 2
       ), h AS (
         SELECT c_nationkey, bal_band, s,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(
              Seq("CAST(c_nationkey AS VARCHAR)", "bal_band"),
              s"$salt:sum:orders_capped"
            )
          )} AS h0
         FROM cells
       ), r AS (
         SELECT c_nationkey, bal_band, s, ${OracleFragments.remix32("h0")} AS u FROM h
       )
       SELECT c_nationkey, bal_band,
         CAST(greatest(s + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS sum_dp,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro,
         CAST($clip AS BIGINT) AS clip
       FROM r ORDER BY c_nationkey, bal_band"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpUserCellCounts]]
    * over the price-banded orders frame: the salted-hash contribution
    * bound (`ROW_NUMBER() OVER (PARTITION BY entity ORDER BY rank-hash,
    * id) <= cap` — the exact window [[graft.operators.Deidentify
    * .boundContributions]] runs), then the census + geometric draw at
    * ε/cap (the user-level sensitivity scaling).
    */
  private def dpUserCountsOracle(cap: Int, epsilonMicro: Long, salt: String): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro / cap)
    val lut = ts.mkString("[", ", ", "]")
    s"""WITH g AS (
         SELECT o_custkey, o_orderkey, o_orderstatus,
           '[' || CAST(CAST(floor(o_totalprice/100000.0)*100000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(o_totalprice/100000.0)*100000 + 100000 AS BIGINT) AS VARCHAR) || ')' AS price_band
         FROM orders
       ), hk AS (
         SELECT o_custkey, o_orderkey, o_orderstatus, price_band,
           ${OracleFragments.polyHash(s"('bc:' || CAST(o_orderkey AS VARCHAR) || ':$salt:bound')")} AS h0
         FROM g
       ), rk AS (
         SELECT o_custkey, o_orderkey, o_orderstatus, price_band,
           ${OracleFragments.remix32("h0")} AS ru
         FROM hk
       ), bounded AS (
         SELECT o_orderstatus, price_band FROM (
           SELECT o_orderstatus, price_band,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ru, o_orderkey) AS rn
           FROM rk)
         WHERE rn <= $cap
       ), cells AS (
         SELECT o_orderstatus, price_band, COUNT(*) AS n FROM bounded GROUP BY 1, 2
       ), h AS (
         SELECT o_orderstatus, price_band, n,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(Seq("o_orderstatus", "price_band"), salt)
          )} AS h0
         FROM cells
       ), r AS (
         SELECT o_orderstatus, price_band, n, ${OracleFragments.remix32("h0")} AS u FROM h
       )
       SELECT o_orderstatus, price_band,
         CAST(greatest(n + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS n_dp,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro,
         CAST($cap AS BIGINT) AS max_rows_per_entity
       FROM r ORDER BY o_orderstatus, price_band"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpUserCellSums]]: the
    * q186 bound CTEs, then clamp + per-cell sum + LUT at ε/(cap·clip)
    * with the `salt:sum:<col>` noise key.
    */
  private def dpUserSumsOracle(cap: Int, clip: Long, epsilonMicro: Long, salt: String): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro / (cap * clip))
    val lut = ts.mkString("[", ", ", "]")
    s"""WITH g AS (
         SELECT o_custkey, o_orderkey, o_orderstatus,
           '[' || CAST(CAST(floor(o_totalprice/100000.0)*100000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(o_totalprice/100000.0)*100000 + 100000 AS BIGINT) AS VARCHAR) || ')' AS price_band,
           greatest(least(o_orderkey % 9, $clip), 0) AS v
         FROM orders
       ), hk AS (
         SELECT o_custkey, o_orderkey, o_orderstatus, price_band, v,
           ${OracleFragments.polyHash(s"('bc:' || CAST(o_orderkey AS VARCHAR) || ':$salt:bound')")} AS h0
         FROM g
       ), rk AS (
         SELECT o_custkey, o_orderkey, o_orderstatus, price_band, v,
           ${OracleFragments.remix32("h0")} AS ru
         FROM hk
       ), bounded AS (
         SELECT o_orderstatus, price_band, v FROM (
           SELECT o_orderstatus, price_band, v,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ru, o_orderkey) AS rn
           FROM rk)
         WHERE rn <= $cap
       ), cells AS (
         SELECT o_orderstatus, price_band, CAST(SUM(v) AS BIGINT) AS s
         FROM bounded GROUP BY 1, 2
       ), h AS (
         SELECT o_orderstatus, price_band, s,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(Seq("o_orderstatus", "price_band"), s"$salt:sum:qty")
          )} AS h0
         FROM cells
       ), r AS (
         SELECT o_orderstatus, price_band, s, ${OracleFragments.remix32("h0")} AS u FROM h
       )
       SELECT o_orderstatus, price_band,
         CAST(greatest(s + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS sum_dp,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro,
         CAST($clip AS BIGINT) AS clip,
         CAST($cap AS BIGINT) AS max_rows_per_entity
       FROM r ORDER BY o_orderstatus, price_band"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpQuantiles]] over a
    * [[graft.operators.Deidentify.dpCellCounts]] release on
    * (c_mktsegment, bal_lo): the histogram mechanism verbatim, then the
    * pure post-processing — per-segment cumulative noised counts, lower
    * quantile at each permille (`cum·1000 >= total·p`).
    */
  private def dpQuantilesOracle(epsilonMicro: Long, salt: String, permilles: Seq[Int]): String = {
    val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(epsilonMicro)
    val lut = ts.mkString("[", ", ", "]")
    val pl = permilles.mkString("[", ", ", "]")
    s"""WITH g AS (
         SELECT c_mktsegment, CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS bal_lo
         FROM customer
       ), cells AS (
         SELECT c_mktsegment, bal_lo, COUNT(*) AS n FROM g GROUP BY 1, 2
       ), h AS (
         SELECT c_mktsegment, bal_lo, n,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(
              Seq("c_mktsegment", "CAST(bal_lo AS VARCHAR)"), salt)
          )} AS h0
         FROM cells
       ), r AS (
         SELECT c_mktsegment, bal_lo, n, ${OracleFragments.remix32("h0")} AS u FROM h
       ), rel AS (
         SELECT c_mktsegment, bal_lo,
           CAST(greatest(n + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS n_dp
         FROM r
       ), cum AS (
         SELECT c_mktsegment, bal_lo, n_dp,
           CAST(SUM(n_dp) OVER (PARTITION BY c_mktsegment ORDER BY bal_lo
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
           CAST(SUM(n_dp) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS total
         FROM rel
       )
       SELECT c_mktsegment, p.permille,
         MIN(CASE WHEN total > 0 AND c*1000 >= total*p.permille THEN bal_lo END) AS band_q,
         CAST(MAX(total) AS BIGINT) AS n_dp_total,
         CAST($epsilonMicro AS BIGINT) AS epsilon_micro
       FROM cum CROSS JOIN (SELECT unnest($pl) AS permille) p
       GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** DuckDB replay of [[graft.operators.Deidentify.dpCellMeans]] over the
    * q187 release pair: ONE census CTE computes both the count and the
    * clipped sum per cell, each gets its own salted draw (count LUT at
    * ε_count, sum LUT at ε_sum/clip), and the mean is the integer
    * fixed-point ratio of the two noised values — ε totals add.
    */
  private def dpMeansOracle(
      epsCount: Long, saltCount: String,
      clip: Long, epsSum: Long, saltSum: String
  ): String = {
    val (kkc, tsc) = graft.operators.Deidentify.dpNoiseLut(epsCount)
    val (kks, tss) = graft.operators.Deidentify.dpNoiseLut(epsSum / clip)
    val lutC = tsc.mkString("[", ", ", "]")
    val lutS = tss.mkString("[", ", ", "]")
    val keyParts = Seq("CAST(c_nationkey AS VARCHAR)", "bal_band")
    s"""WITH g AS (
         SELECT c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band,
           greatest(least(c_custkey % 13, $clip), 0) AS v
         FROM customer
       ), cells AS (
         SELECT c_nationkey, bal_band, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv
         FROM g GROUP BY 1, 2
       ), h AS (
         SELECT c_nationkey, bal_band, n, sv,
           ${OracleFragments.polyHash(OracleFragments.dpCellKey(keyParts, saltCount))} AS h0c,
           ${OracleFragments.polyHash(
            OracleFragments.dpCellKey(keyParts, s"$saltSum:sum:orders_capped"))} AS h0s
         FROM cells
       ), r AS (
         SELECT c_nationkey, bal_band, n, sv,
           ${OracleFragments.remix32("h0c")} AS uc,
           ${OracleFragments.remix32("h0s")} AS us
         FROM h
       ), rel AS (
         SELECT c_nationkey, bal_band,
           CAST(greatest(n + len(list_filter($lutC, t -> t <= uc)) - $kkc, 0) AS BIGINT) AS n_dp,
           CAST(greatest(sv + len(list_filter($lutS, t -> t <= us)) - $kks, 0) AS BIGINT) AS sum_dp
         FROM r
       )
       SELECT c_nationkey, bal_band, n_dp, sum_dp,
         CASE WHEN n_dp > 0
           THEN CAST((CAST(sum_dp AS HUGEINT) * 1000) // CAST(n_dp AS HUGEINT) AS BIGINT) END AS mean_milli,
         CAST(${epsCount + epsSum} AS BIGINT) AS epsilon_micro
       FROM rel ORDER BY c_nationkey, bal_band"""
  }

  /** DuckDB replay of the q187 ledger: both releases census the SAME
    * banded customer cells, so one `m` CTE (cell count + salt-free
    * domain digest) serves both manifest rows; the running ε total is a
    * literal per row (two releases, 1.0 then +2.0).
    */
  private def dpLedgerOracle: String = {
    val dom = OracleFragments.domainCellKey(Seq("CAST(c_nationkey AS VARCHAR)", "bal_band"))
    s"""WITH g AS (
         SELECT c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
         FROM customer
       ), cells AS (
         SELECT c_nationkey, bal_band FROM g GROUP BY 1, 2
       ), hd AS (
         SELECT ${OracleFragments.polyHash(dom)} AS h0 FROM cells
       ), rd AS (
         SELECT ${OracleFragments.remix32("h0")} AS u FROM hd
       ), m AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, CAST(coalesce(bit_xor(u), 0) AS BIGINT) AS domain_hash FROM rd
       )
       SELECT 'rel_a_counts' AS release_id, 'count' AS kind,
         CAST(1000000 AS BIGINT) AS epsilon_micro, CAST(1 AS BIGINT) AS sensitivity,
         'r14a' AS salt_id, n_cells, domain_hash,
         'bal_band,c_nationkey' AS domain,
         CAST(1000000 AS BIGINT) AS eps_cum_micro
       FROM m
       UNION ALL
       SELECT 'rel_b_sums', 'sum', CAST(2000000 AS BIGINT), CAST(8 AS BIGINT),
         'r14b', n_cells, domain_hash, 'bal_band,c_nationkey', CAST(3000000 AS BIGINT)
       FROM m
       ORDER BY release_id"""
  }

  /** DuckDB replay of the q192 budget-enforced ledger: the q187 pair's
    * customer-cell domain digest plus a second digest over the orders
    * cells; both the global running ε and the per-domain cumulative ε
    * are literals per row (three releases in release_id order: customer
    * 1.0 → 3.0, orders 1.5 — the Spark side's at-cap 3.0 passes the
    * 3.0 cap, proving `<=` not `<`).
    */
  private def dpBudgetOracle: String = {
    val domC = OracleFragments.domainCellKey(Seq("CAST(c_nationkey AS VARCHAR)", "bal_band"))
    val domO = OracleFragments.domainCellKey(Seq("o_orderstatus", "price_band"))
    s"""WITH g AS (
         SELECT c_nationkey,
           '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
         FROM customer
       ), cells_c AS (
         SELECT c_nationkey, bal_band FROM g GROUP BY 1, 2
       ), hd_c AS (
         SELECT ${OracleFragments.polyHash(domC)} AS h0 FROM cells_c
       ), rd_c AS (
         SELECT ${OracleFragments.remix32("h0")} AS u FROM hd_c
       ), m_c AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, CAST(coalesce(bit_xor(u), 0) AS BIGINT) AS domain_hash FROM rd_c
       ), og AS (
         SELECT o_orderstatus,
           '[' || CAST(CAST(floor(o_totalprice/100000.0)*100000 AS BIGINT) AS VARCHAR) || ',' ||
           CAST(CAST(floor(o_totalprice/100000.0)*100000 + 100000 AS BIGINT) AS VARCHAR) || ')' AS price_band
         FROM orders
       ), cells_o AS (
         SELECT o_orderstatus, price_band FROM og GROUP BY 1, 2
       ), hd_o AS (
         SELECT ${OracleFragments.polyHash(domO)} AS h0 FROM cells_o
       ), rd_o AS (
         SELECT ${OracleFragments.remix32("h0")} AS u FROM hd_o
       ), m_o AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, CAST(coalesce(bit_xor(u), 0) AS BIGINT) AS domain_hash FROM rd_o
       )
       SELECT 'rel_a_counts' AS release_id, 'count' AS kind,
         CAST(1000000 AS BIGINT) AS epsilon_micro, CAST(1 AS BIGINT) AS sensitivity,
         'r14a' AS salt_id, n_cells, domain_hash,
         'bal_band,c_nationkey' AS domain,
         CAST(1000000 AS BIGINT) AS eps_cum_micro,
         CAST(1000000 AS BIGINT) AS eps_domain_cum_micro
       FROM m_c
       UNION ALL
       SELECT 'rel_b_sums', 'sum', CAST(2000000 AS BIGINT), CAST(8 AS BIGINT),
         'r14b', n_cells, domain_hash, 'bal_band,c_nationkey',
         CAST(3000000 AS BIGINT), CAST(3000000 AS BIGINT)
       FROM m_c
       UNION ALL
       SELECT 'rel_c_orders', 'count', CAST(1500000 AS BIGINT), CAST(1 AS BIGINT),
         'r15c', n_cells, domain_hash, 'o_orderstatus,price_band',
         CAST(4500000 AS BIGINT), CAST(1500000 AS BIGINT)
       FROM m_o
       ORDER BY release_id"""
  }

  private def mondrianUtilityOracle(k: Long, rounds: Int): String =
    mondrianOracle(k, rounds) +
      """SELECT CAST(SUM(cell_n) AS BIGINT) AS n_rows,
             COUNT(*) AS n_partitions,
             MIN(cell_n) AS min_cell,
             CAST(SUM(cell_n)*1000 // COUNT(*) AS BIGINT) AS avg_cell_milli,
             CAST(SUM(cell_n*cell_n) AS BIGINT) AS discernibility,
             CAST(SUM(cell_n*(a_hi-a_lo+1))*1000 // SUM(cell_n) AS BIGINT) AS a_width_milli,
             CAST(SUM(cell_n*(b_hi-b_lo+1))*1000 // SUM(cell_n) AS BIGINT) AS b_width_milli
      FROM boxes"""

  /** [[rawOracleSql]] with every CTE pinned `AS MATERIALIZED` — see
    * [[OracleFragments.materializeCtes]] for why (DuckDB inlines plain
    * CTEs per reference; the shared-chain oracles re-ran their whole
    * upstream pipeline up to 7×, overrunning the driver's compare
    * budget three rounds straight).
    */
  lazy val oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) => k -> OracleFragments.materializeCtes(v) }

  private lazy val rawOracleSql: Map[String, String] = Map(
    "q175_mondrian" -> mondrianRowOracle(50L, 4),
    "q176_mondrian_utility" -> mondrianUtilityOracle(50L, 4),
    // the composed k-anonymous release: the Mondrian chain + the salted
    // pseudonym replay (the write/read-back is value-transparent)
    "q178_k_release" -> (
      mondrianOracle(50L, 4) +
        s""", rel AS (
           SELECT ${OracleFragments.polyHash(OracleFragments.pseudoKey("cust", "CAST(s.c_custkey AS VARCHAR)", "rel2"))} AS h0,
             x.cell_n, x.a_lo, x.a_hi, x.b_lo, x.b_hi
           FROM s4 s JOIN boxes x USING (pid)
         )
         SELECT ${OracleFragments.remix32("h0")} AS p_cust,
           cell_n, a_lo, a_hi, b_lo, b_hi
         FROM rel ORDER BY p_cust"""
    ),
    "q179_date_truncate" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY 1 ORDER BY 1""",
    // ε-DP cell histogram replays: census → salted-hash uniform →
    // inverse-CDF through the embedded geometric LUT (q181's write/
    // read-back is value-transparent, the q167/q178 discipline)
    "q180_dp_counts" -> dpCountsOracle(Seq("c_nationkey", "bal_band"), 1000000L, "r13"),
    "q181_dp_release" -> dpCountsOracle(Seq("c_mktsegment", "bal_band"), 500000L, "rel13"),
    // the resumable dump is value-transparent: crash + resume + idempotent
    // re-entry all happen inside the gate; content must equal the source
    "q182_resumable_dump" -> "SELECT * FROM customer ORDER BY c_custkey",
    "q183_dp_closed_hist" -> dpClosedHistOracle(1000000L, "r13h"),
    "q184_dp_sums" -> dpSumsOracle(8L, 2000000L, "r13"),
    // user-level DP: salted-hash contribution bound then noise at ε/cap
    "q186_dp_user_counts" -> dpUserCountsOracle(3, 3000000L, "r14"),
    // the release ledger: manifest rows + running ε over one shared domain
    "q187_dp_ledger" -> dpLedgerOracle,
    // user-level sums: bound + clip → L1 ≤ cap·clip, LUT at ε/(cap·clip)
    "q188_dp_user_sums" -> dpUserSumsOracle(3, 5L, 6000000L, "r14"),
    // quantiles as histogram post-processing: ε spent once, in the census
    "q189_dp_quantiles" -> dpQuantilesOracle(2000000L, "r14q", Seq(250, 500, 750)),
    // means as the ratio of the two q187 releases: ε_count + ε_sum
    "q190_dp_means" -> dpMeansOracle(1000000L, "r14a", 8L, 2000000L, "r14b"),
    // top-k of the q180-family release: post-processing, deterministic ties
    "q191_dp_topk" -> {
      val (kk, ts) = graft.operators.Deidentify.dpNoiseLut(1000000L)
      val lut = ts.mkString("[", ", ", "]")
      s"""WITH g AS (
           SELECT c_nationkey,
             '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
             CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
           FROM customer
         ), cells AS (
           SELECT c_nationkey, bal_band, COUNT(*) AS n FROM g GROUP BY 1, 2
         ), h AS (
           SELECT c_nationkey, bal_band, n,
             ${OracleFragments.polyHash(
              OracleFragments.dpCellKey(Seq("CAST(c_nationkey AS VARCHAR)", "bal_band"), "r14a")
            )} AS h0
           FROM cells
         ), r AS (
           SELECT c_nationkey, bal_band, n, ${OracleFragments.remix32("h0")} AS u FROM h
         ), rel AS (
           SELECT c_nationkey, bal_band,
             CAST(greatest(n + len(list_filter($lut, t -> t <= u)) - $kk, 0) AS BIGINT) AS n_dp
           FROM r
         ), ranked AS (
           SELECT c_nationkey, bal_band, n_dp,
             CAST(ROW_NUMBER() OVER (ORDER BY n_dp DESC, c_nationkey ASC, bal_band ASC) AS INT) AS rank
           FROM rel
         )
         SELECT c_nationkey, bal_band, n_dp, rank,
           CAST(1000000 AS BIGINT) AS epsilon_micro
         FROM ranked WHERE rank <= 10 ORDER BY rank"""
    },
    "q192_dp_budget" -> dpBudgetOracle,
    "q185_dump_all" ->
      """SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
         UNION ALL SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
         UNION ALL SELECT 'region', CAST(COUNT(*) AS BIGINT) FROM region
         ORDER BY table_name""",
    // categorical t-closeness replay: per-(cell, value) counts against
    // the global distribution, TVD in HUGEINT with // for the div
    "q177_t_closeness_cat" ->
      """WITH nn AS (
           SELECT c_nationkey, c_mktsegment AS v FROM customer WHERE c_mktsegment IS NOT NULL
         ), gd AS (
           SELECT v, COUNT(*) AS g FROM nn GROUP BY v
         ), gg AS (
           SELECT v, g, (SELECT COUNT(*) FROM nn) AS nt FROM gd
         ), cells AS (
           SELECT c_nationkey, COUNT(*) AS cell_n FROM nn GROUP BY 1
         ), cv AS (
           SELECT c_nationkey, v, COUNT(*) AS c FROM nn GROUP BY 1, 2
         ), term AS (
           SELECT cells.c_nationkey, cells.cell_n, gg.nt,
             abs(CAST(COALESCE(cv.c, 0) AS HUGEINT)*CAST(gg.nt AS HUGEINT)
               - CAST(gg.g AS HUGEINT)*CAST(cells.cell_n AS HUGEINT)) AS t
           FROM cells CROSS JOIN gg
           LEFT JOIN cv ON cv.c_nationkey = cells.c_nationkey AND cv.v = gg.v
         )
         SELECT c_nationkey, cell_n,
           CAST((SUM(t) * 1000000) // (2 * CAST(cell_n AS HUGEINT) * CAST(nt AS HUGEINT)) AS BIGINT) AS tvd_micro,
           (CAST((SUM(t) * 1000000) // (2 * CAST(cell_n AS HUGEINT) * CAST(nt AS HUGEINT)) AS BIGINT) <= 80000) AS ok
         FROM term GROUP BY c_nationkey, cell_n, nt
         ORDER BY c_nationkey""",
    // de-identification replays: the salted pseudonym is
    // remix32(polyHash(domain:value:salt)) — hash in one CTE (the remix
    // fragment inlines its argument), remix in the next
    "q159_pseudonymize" ->
      s"""WITH ch AS (
           SELECT ${polyHash(OracleFragments.pseudoKey("cust", "CAST(c_custkey AS VARCHAR)", "r11"))} AS h0
           FROM customer
         ), cust AS (SELECT ${OracleFragments.remix32("h0")} AS p_cust FROM ch),
         oh AS (
           SELECT ${polyHash(OracleFragments.pseudoKey("cust", "CAST(o_custkey AS VARCHAR)", "r11"))} AS hc,
             ${polyHash(OracleFragments.pseudoKey("order", "CAST(o_orderkey AS VARCHAR)", "r11"))} AS ho
           FROM orders
         ), ords AS (
           SELECT ${OracleFragments.remix32("hc")} AS p_cust,
             ${OracleFragments.remix32("ho")} AS p_order
           FROM oh
         )
         SELECT p_cust, COUNT(*) AS n_orders, MIN(p_order) AS min_p_order
         FROM ords JOIN cust USING (p_cust)
         GROUP BY p_cust ORDER BY p_cust""",
    "q160_date_shift" ->
      s"""WITH h AS (
           SELECT o_orderkey, o_custkey, o_orderdate,
             ${polyHash(OracleFragments.pseudoKey("dateshift", "CAST(o_custkey AS VARCHAR)", "r11"))} AS h0
           FROM orders
         ), r AS (
           SELECT o_orderkey, o_custkey, o_orderdate,
             ${OracleFragments.remix32("h0")} % 61 - 30 AS off
           FROM h
         )
         SELECT o_orderkey, o_custkey,
           o_orderdate + off * INTERVAL 1 DAY AS o_orderdate
         FROM r ORDER BY o_orderkey""",
    "q161_k_anonymize" ->
      s"""WITH g AS (
           SELECT c_custkey, c_nationkey,
             '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
             CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
           FROM customer
         ), c AS (
           SELECT *, COUNT(*) OVER (PARTITION BY c_nationkey, bal_band) AS n FROM g
         )
         SELECT c_custkey,
           CASE WHEN n < 5 THEN NULL ELSE c_nationkey END AS c_nationkey,
           CASE WHEN n < 5 THEN NULL ELSE bal_band END AS bal_band,
           (n < 5) AS suppressed
         FROM c ORDER BY c_custkey""",
    "q162_l_diversity" ->
      s"""WITH g AS (
           SELECT c_nationkey, c_mktsegment,
             '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
             CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
           FROM customer
         )
         SELECT c_nationkey, c_mktsegment, COUNT(*) AS cell_n,
           COUNT(DISTINCT bal_band) AS n_distinct,
           (COUNT(DISTINCT bal_band) >= 3) AS ok
         FROM g GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",
    // blocklist replay: the stop-word occurrence-count fragment over the
    // literal list
    "q163_blocklist" -> {
      val hits = OracleFragments.stopwordHits("text", Seq("dup", "slow", "big"))
      s"""SELECT doc_id, CAST($hits AS BIGINT) AS n_hits, ($hits = 0) AS keep
         FROM documents ORDER BY doc_id"""
    },
    // vocab-growth replay: min-doc-per-token, then per-checkpoint counts
    "q164_vocab_growth" ->
      s"""WITH cp AS (SELECT CAST(unnest([100, 200, 300, 400, 500]) AS BIGINT) AS checkpoint),
         tok AS (
           SELECT doc_id, unnest(${OracleFragments.tokens("text")}) AS tk FROM documents
         ), fd AS (
           SELECT tk, MIN(doc_id) AS fd FROM tok GROUP BY tk
         ), v AS (
           SELECT checkpoint, COUNT(*) AS vocab FROM cp JOIN fd ON fd.fd <= cp.checkpoint GROUP BY checkpoint
         ), tt AS (
           SELECT checkpoint, COUNT(*) AS n_tokens FROM cp JOIN tok ON tok.doc_id <= cp.checkpoint GROUP BY checkpoint
         )
         SELECT cp.checkpoint AS checkpoint,
           COALESCE(vocab, 0) AS vocab, COALESCE(n_tokens, 0) AS n_tokens
         FROM cp LEFT JOIN v USING (checkpoint) LEFT JOIN tt USING (checkpoint)
         ORDER BY checkpoint""",
    // composed-release replay: the shift+pseudonym chain in one pass —
    // the artifact write/read-back is transparent to values
    "q167_deid_release" ->
      s"""WITH h AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
             ${polyHash(OracleFragments.pseudoKey("dateshift", "CAST(o_custkey AS VARCHAR)", "rel1"))} AS hs,
             ${polyHash(OracleFragments.pseudoKey("order", "CAST(o_orderkey AS VARCHAR)", "rel1"))} AS ho,
             ${polyHash(OracleFragments.pseudoKey("cust", "CAST(o_custkey AS VARCHAR)", "rel1"))} AS hc
           FROM orders
         )
         SELECT ${OracleFragments.remix32("ho")} AS o_orderkey,
           ${OracleFragments.remix32("hc")} AS o_custkey,
           o_orderstatus, o_totalprice,
           o_orderdate + (${OracleFragments.remix32("hs")} % 61 - 30) * INTERVAL 1 DAY AS o_orderdate,
           o_orderpriority
         FROM h ORDER BY o_orderkey, o_custkey""",
    // top-coding replay: clamp + flag, trivially exact
    "q168_top_code" ->
      """SELECT c_custkey, LEAST(c_acctbal, 9000.0) AS c_acctbal,
           (c_acctbal >= 9000.0) AS top_coded
         FROM customer ORDER BY c_custkey""",
    // suppress-serve replay: the FULL table's census drives the slice's
    // suppression (the window count runs before the slice filter)
    "q169_suppress_serve" ->
      """WITH g AS (
           SELECT c_custkey, c_nationkey,
             '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
             CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
           FROM customer
         ), c AS (
           SELECT *, COUNT(*) OVER (PARTITION BY c_nationkey, bal_band) AS n FROM g
         )
         SELECT c_custkey,
           CASE WHEN n < 5 THEN NULL ELSE c_nationkey END AS c_nationkey,
           CASE WHEN n < 5 THEN NULL ELSE bal_band END AS bal_band,
           (n < 5) AS suppressed
         FROM c WHERE c_custkey <= 300 ORDER BY c_custkey""",
    // range-join replay: the plain inequality join (DuckDB's optimizer
    // handles the theta join at oracle scale; the Spark side's bucketing
    // is plan shape, not semantics)
    "q173_range_join" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS p FROM events WHERE event_type = 'click'
         ), e AS (
           SELECT event_id AS err_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS w_end
           FROM events WHERE event_type = 'error'
         )
         SELECT c.event_id, e.err_id FROM c JOIN e ON c.p >= e.s AND c.p < e.w_end
         ORDER BY c.event_id, e.err_id""",
    "q174_interval_join" ->
      """WITH e AS (
           SELECT event_id AS err_id, epoch_us(ts) AS es, epoch_us(ts) + 600000000 AS ee
           FROM events WHERE event_type = 'error'
         ), p AS (
           SELECT event_id AS pur_id, epoch_us(ts) AS ps, epoch_us(ts) + 300000000 AS pe
           FROM events WHERE event_type = 'purchase'
         )
         SELECT e.err_id, p.pur_id FROM e JOIN p ON e.es < p.pe AND p.ps < e.ee
         ORDER BY e.err_id, p.pur_id""",
    // named-dump replay: coalesce(1) + maxRecordsPerFile=400 shards a
    // count-n table into ceil(n/400) files of least(400, remaining)
    "q170_dump_named" ->
      """WITH s AS (
           SELECT CAST(floor((rn - 1) / 400) AS BIGINT) AS shard_idx
           FROM (SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn FROM customer)
         )
         SELECT shard_idx, COUNT(*) AS rows FROM s GROUP BY shard_idx ORDER BY shard_idx""",
    // risk-audit replay: CUBE + per-column GROUPING flags label the
    // subset portably (bitmask bit order differs across engines)
    "q171_risk_audit" ->
      """WITH g AS (
           SELECT c_custkey, c_nationkey, c_mktsegment,
             '[' || CAST(CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS VARCHAR) || ',' ||
             CAST(CAST(floor(c_acctbal/2000.0)*2000 + 2000 AS BIGINT) AS VARCHAR) || ')' AS bal_band
           FROM customer
         ), cells AS (
           SELECT concat_ws(',',
               CASE WHEN GROUPING(c_nationkey) = 0 THEN 'c_nationkey' END,
               CASE WHEN GROUPING(c_mktsegment) = 0 THEN 'c_mktsegment' END,
               CASE WHEN GROUPING(bal_band) = 0 THEN 'bal_band' END) AS subset,
             COUNT(*) AS cell_n
           FROM g GROUP BY CUBE (c_nationkey, c_mktsegment, bal_band)
         )
         SELECT subset, COUNT(*) AS n_cells,
           CAST(SUM(CASE WHEN cell_n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton_cells,
           CAST(SUM(CASE WHEN cell_n < 5 THEN cell_n ELSE 0 END) AS BIGINT) AS n_risky_rows,
           MIN(cell_n) AS min_cell_n
         FROM cells WHERE subset <> '' GROUP BY subset ORDER BY subset""",
    // t-closeness replay: per-cell prefix-CDF EMD in HUGEINT (mirrors
    // decimal(38,0)), integral // mirrors Spark's decimal div
    "q172_t_closeness" ->
      """WITH nn AS (
           SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal/2000.0)*2000 AS BIGINT) AS v
           FROM customer WHERE c_acctbal IS NOT NULL
         ), gd AS (
           SELECT v, COUNT(*) AS gc FROM nn GROUP BY v
         ), gg AS (
           SELECT v,
             SUM(gc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_cum,
             (SELECT COUNT(*) FROM gd) AS m, (SELECT COUNT(*) FROM nn) AS nt
           FROM gd
         ), cells AS (
           SELECT c_nationkey, c_mktsegment, COUNT(*) AS cell_n FROM nn GROUP BY 1, 2
         ), cv AS (
           SELECT c_nationkey, c_mktsegment, v, COUNT(*) AS c FROM nn GROUP BY 1, 2, 3
         ), dense AS (
           SELECT cells.c_nationkey, cells.c_mktsegment, cells.cell_n,
             gg.v, gg.g_cum, gg.m, gg.nt, COALESCE(cv.c, 0) AS c
           FROM cells CROSS JOIN gg
           LEFT JOIN cv ON cv.c_nationkey = cells.c_nationkey
             AND cv.c_mktsegment = cells.c_mktsegment AND cv.v = gg.v
         ), pre AS (
           SELECT *, SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cum
           FROM dense
         ), term AS (
           SELECT c_nationkey, c_mktsegment, cell_n, m, nt,
             abs(CAST(c_cum AS HUGEINT)*CAST(nt AS HUGEINT)
               - CAST(g_cum AS HUGEINT)*CAST(cell_n AS HUGEINT)) AS t
           FROM pre
         )
         SELECT c_nationkey, c_mktsegment, cell_n,
           CAST(CASE WHEN m = 1 THEN 0 ELSE
             (SUM(t) * 1000000) // (CAST(cell_n AS HUGEINT)*CAST(nt AS HUGEINT)*CAST(m-1 AS HUGEINT))
           END AS BIGINT) AS emd_micro,
           (CAST(CASE WHEN m = 1 THEN 0 ELSE
             (SUM(t) * 1000000) // (CAST(cell_n AS HUGEINT)*CAST(nt AS HUGEINT)*CAST(m-1 AS HUGEINT))
           END AS BIGINT) <= 50000) AS ok
         FROM term GROUP BY c_nationkey, c_mktsegment, cell_n, m, nt
         ORDER BY c_nationkey, c_mktsegment""",
    // phrase-blocklist replay: per length-k group, count positional
    // k-windows equal to a listed phrase (clamped window convention)
    "q166_phrase_blocklist" -> {
      def cnt(k: Int, ps: Seq[String]): String = {
        val lst = ps.map(p => s"'$p'").mkString("[", ", ", "]")
        s"len(list_filter(${OracleFragments.positionalShingles("text", k)}, w -> list_contains($lst, w)))"
      }
      val hits = s"(${cnt(2, Seq("table hash", "slow key"))} + ${cnt(3, Seq("customer join order"))})"
      s"""SELECT doc_id, CAST($hits AS BIGINT) AS n_hits, ($hits = 0) AS keep
         FROM documents ORDER BY doc_id"""
    },
    // grouped-packing replay: the running-sum window partitioned by the
    // label group, ordered (hash, id) like every packing oracle
    "q165_pack_grouped" ->
      s"""WITH d AS (
           SELECT doc_id, label, ${polyHash("text")} AS h,
             len(${OracleFragments.tokens("text")}) AS n_tok
           FROM documents JOIN embeddings ON doc_id = vec_id
         ), w AS (
           SELECT CAST(label AS VARCHAR) AS bucket, doc_id, h, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY label ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM d
         )
         SELECT bucket, (cum - n_tok) // 256 AS seq_id, doc_id, h, n_tok, cum
         FROM w ORDER BY doc_id""",
    // embedding-join replay: both slices' bucket rows, exact (t, bucket)
    // equi-join, DISTINCT scored pairs, ROW_NUMBER <= 5 per query
    "q158_ann_join" -> {
      val L = Similarity.LshTables
      val w = Similarity.LshPlanesPerTable
      val buckets = lshBucketsList("embedding", L, w, Similarity.Dim)
      s"""WITH lft AS (
           SELECT vec_id, embedding, $buckets AS buckets
           FROM embeddings WHERE vec_id % 10 <> 9
         ), lbt AS (
           SELECT vec_id, embedding, t, buckets[t+1] AS bucket
           FROM lft, unnest(range(0, $L)) AS tt(t)
         ), rgt AS (
           SELECT vec_id, embedding, $buckets AS buckets
           FROM embeddings WHERE vec_id % 10 = 9
         ), rbt AS (
           SELECT vec_id, embedding, t, buckets[t+1] AS bucket
           FROM rgt, unnest(range(0, $L)) AS tt(t)
         ), cand AS (
           SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id,
             ${cosine("l.embedding", "r.embedding")} AS cos
           FROM lbt l JOIN rbt r ON l.t = r.t AND l.bucket = r.bucket
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM cand
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },
    // boundary replay: the packAcross stream with a first-of-doc flag
    // (pos = 0 — EOS rows sit at max+1, never 0); LEFT JOIN keeps
    // boundary-free windows with NULL start_pos
    "q155_pack_boundaries" ->
      s"""${bpeEncodeCtes(8)}, stream AS (
           SELECT doc_id, pos, sym_id FROM enc
           UNION ALL
           SELECT doc_id, 1 + max(pos) AS pos, CAST(-1 AS BIGINT) AS sym_id
           FROM enc GROUP BY doc_id
         ), g AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id, pos) - 1 AS BIGINT) AS gpos,
             (pos = 0) AS is_start
           FROM stream
         ), win AS (
           SELECT gpos // 64 AS chunk_idx, CAST(COUNT(*) AS BIGINT) AS n_ids
           FROM g GROUP BY 1
         ), st AS (
           SELECT gpos // 64 AS chunk_idx, gpos % 64 AS start_pos FROM g WHERE is_start
         )
         SELECT win.chunk_idx, n_ids, st.start_pos
         FROM win LEFT JOIN st USING (chunk_idx)
         ORDER BY win.chunk_idx, st.start_pos NULLS FIRST""",
    // epoch-expansion replay: the sorted-key CASE chain, the salted
    // content-hash fractional draw, and unnest(range(0, copies))
    "q156_epoch_expand" -> {
      val cases = (0 until 20)
        .map(i => s"src$i" -> Seq(400L, 1000L, 1700L, 2300L)(i % 4))
        .sortBy(_._1)
        .map { case (g, e) => s"WHEN source = '$g' THEN $e" }
        .mkString(" ")
      s"""WITH base AS (
           SELECT doc_id, source,
             (CASE $cases ELSE 1000 END) AS em,
             (${polyHash("(text || ':epoch')")} % 1000) AS draw
           FROM documents
         ), copies AS (
           SELECT doc_id, source,
             em // 1000 + (CASE WHEN draw < em % 1000 THEN 1 ELSE 0 END) AS nc
           FROM base
         )
         SELECT doc_id, source, CAST(c AS BIGINT) AS copy_idx
         FROM copies, unnest(range(0, nc)) AS u(c)
         ORDER BY doc_id, copy_idx"""
    },
    // tokenizer-drift replay: ONE 8-round chain serves both sides —
    // prefix stability makes s6 the 6-merge artifact; full join mirrors
    // the operator's general form (word sets equal here)
    "q157_tokenizer_diff" ->
      s"""${bpeChain(8)}
         SELECT COALESCE(o.w, n.w) AS w,
           CASE WHEN o.w IS NULL THEN 'added'
                WHEN n.w IS NULL THEN 'removed'
                WHEN o.syms IS DISTINCT FROM n.syms THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(COALESCE(len(o.syms), 0) AS BIGINT) AS n_syms_old,
           CAST(COALESCE(len(n.syms), 0) AS BIGINT) AS n_syms_new,
           COALESCE(n.cnt, o.cnt) AS cnt
         FROM s6 o FULL JOIN s8 n ON o.w = n.w
         ORDER BY w""",
    "q127_bpe_encode" -> bpeEncodeOracle(8),
    "q130_pack_ids" -> packIdsOracle(8, 64),
    "q131_pack_across" -> packAcrossOracle(8, 64, -1L),
    "q132_cms_counts" -> cmsOracle(4, 256),
    "q133_rank_metrics" -> rankMetricsOracle,
    "q134_wp_greedy_encode" -> greedyEncodeOracle(8, 16),
    "q100_bpe_merges" -> bpeOracle(8),
    "q101_bpe_profile" -> bpeProfileOracle(8),
    "q111_wordpiece_merges" -> bpeOracle(8, wordpiece = true),
    "q120_collocations" ->
      s"""WITH d AS (SELECT ${tokens("text")} AS toks FROM documents),
         pr AS (SELECT toks[j+1] AS l, toks[j+2] AS r
                FROM d, unnest(range(0, len(toks) - 1)) AS u(j)),
         pc AS (SELECT l, r, CAST(COUNT(*) AS BIGINT) AS n_lr
                FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         ug AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n
                FROM (SELECT unnest(toks) AS t FROM d) t0 GROUP BY 1),
         tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n_total FROM d)
         SELECT pc.l, pc.r, n_lr, ul.n AS n_l, ur.n AS n_r,
           n_lr * n_total * 1000000 // (ul.n * ur.n) AS lift_micro
         FROM pc JOIN ug ul ON ul.t = pc.l JOIN ug ur ON ur.t = pc.r CROSS JOIN tot
         ORDER BY lift_micro DESC, pc.l, pc.r LIMIT 30""",
    "q112_corpus_card" ->
      s"""WITH pl AS (
           SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(${tokens("text")})) AS BIGINT) AS n_tokens,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(COUNT(DISTINCT ${polyHash("text")}) AS BIGINT) AS n_distinct
           FROM documents GROUP BY 1, 2
         ), agg AS (
           SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(SUM(n_distinct) AS BIGINT) AS nd
           FROM pl GROUP BY 1
         ), top AS (
           SELECT source, lang AS top_lang FROM (
             SELECT source, lang,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, lang) AS r
             FROM pl) t WHERE r = 1
         )
         SELECT agg.source, n_docs, n_tokens, n_chars, n_langs, top_lang,
           n_tokens * 1000 // n_docs AS mean_tok_milli,
           (n_docs - nd) * 1000 // n_docs AS dup_permille
         FROM agg JOIN top USING (source) ORDER BY source""",
    "q113_snapshot_diff" ->
      s"""WITH olds AS (
           SELECT doc_id, ${polyHash("text")} AS old_ph FROM documents WHERE doc_id % 7 <> 0
         ), news AS (
           SELECT doc_id, ${polyHash("t2")} AS new_ph FROM (
             SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' rev' ELSE text END AS t2
             FROM documents WHERE doc_id % 5 <> 0) n0
         )
         SELECT coalesce(olds.doc_id, news.doc_id) AS doc_id,
           CASE WHEN olds.doc_id IS NULL THEN 'added'
                WHEN news.doc_id IS NULL THEN 'removed'
                WHEN old_ph IS DISTINCT FROM new_ph THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM olds FULL JOIN news ON olds.doc_id = news.doc_id
         ORDER BY doc_id""",
    // the sketch only bounds pass-2's recount set, so the oracle is the
    // plain exact GROUP BY / threshold the operator's result equals
    "q102_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(${tokens("text")}) AS tok FROM documents),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tk),
         f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY tok)
         SELECT tok, freq, freq * 1000 // n AS permille
         FROM f, tot WHERE freq * 64 > n ORDER BY freq DESC, tok""",
    // every fixed-point step of Retrieval's scoring replayed with // —
    // idf_u = (N-df)*1e6 // (df+1), k_m = 300 + 900*dl*1000 // avgdl_m,
    // term = idf_u * tf*2200 // (tf*1000 + k_m), integer-summed
    "q103_bm25" -> bm25Oracle,
    // BM25 served from the index + norms artifacts == the direct path
    "q124_bm25_indexed" -> bm25Oracle,
    // IVF served from persisted codebook/assignments == train-in-plan
    "q125_ann_ivf_serve" -> annIvfOracle,
    "q136_ann_ivf_fresh" -> annIvfFreshOracle,
    "q137_mmr_topk" -> mmrOracle(5, 20, 700),
    "q138_pca_project" -> pcaOracle(12),
    "q139_pca_remove" -> pcaRemoveOracle(12),
    // prefix retrieval: LIKE over the (tok, doc) tf frame, distinct-term
    // coordination + tf mass per doc
    "q128_prefix_search" ->
      s"""WITH occ AS (SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents),
         tf AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
                FROM occ WHERE tok LIKE 's%' GROUP BY 1, 2)
         SELECT doc_id, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS tf_sum
         FROM tf GROUP BY doc_id ORDER BY doc_id""",
    // proximity NEAR/slop: windowed self-join — min |pos_a - pos_b| per
    // doc over the two terms' occurrences, matched iff min - 1 <= slop
    "q126_near_search" ->
      s"""WITH d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
         occ AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, unnest(toks) AS tok FROM d),
         pa AS (SELECT doc_id, pos FROM occ WHERE tok = 'table'),
         pb AS (SELECT doc_id, pos FROM occ WHERE tok = 'vector')
         SELECT doc_id, CAST(MIN(ABS(pa.pos - pb.pos)) AS BIGINT) AS min_dist
         FROM pa JOIN pb USING (doc_id) GROUP BY doc_id
         HAVING MIN(ABS(pa.pos - pb.pos)) - 1 <= 3 ORDER BY doc_id""",
    // the flattened posting rows replayed over the same (tok, doc) tf
    // frame; pos = the 0-based position in the doc-id-sorted posting list
    "q107_inverted_index" -> invertedIndexOracle,
    // merge(index(A), index(B)) over disjoint halves == the full rebuild:
    // the oracle IS q107's full-corpus index
    "q115_index_merge" -> invertedIndexOracle,
    // indexed phrase search must equal the direct scan — same oracle
    "q116_phrase_indexed" ->
      s"""WITH d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
         occ AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, unnest(toks) AS tok FROM d),
         l0 AS (SELECT doc_id, pos AS s FROM occ WHERE tok = 'table'),
         l1 AS (SELECT doc_id, pos - 1 AS s FROM occ WHERE tok = 'hash')
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
         FROM (SELECT l0.doc_id, l0.s FROM l0 JOIN l1 ON l0.doc_id = l1.doc_id AND l0.s = l1.s) t
         GROUP BY doc_id ORDER BY doc_id""",
    "q117_table_profile" -> {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      cols
        .map(c =>
          s"""SELECT '$c' AS "column", (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
             CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             CAST(MIN($c) AS VARCHAR) AS min_val,
             CAST(MAX($c) AS VARCHAR) AS max_val
             FROM documents"""
        )
        .mkString(" UNION ALL ") + " ORDER BY \"column\""
    },
    "q118_hll_distinct" -> {
      val p = 4
      val m = 1 << p
      val lut = graft.operators.Sketch.hllLut(p).mkString("[", ", ", "]")
      val alphaM2 = graft.operators.Sketch.hllAlphaM2(p)
      s"""WITH ph AS (SELECT lang, ${polyHash("text")} AS ph0 FROM documents),
         hh AS (SELECT lang, ${remix32("ph0")} AS h FROM ph),
         rr AS (SELECT lang, h % $m AS reg,
           CASE WHEN (h // $m) = 0 THEN ${32 - p + 1}
                ELSE CAST(round(log2((h // $m) & -(h // $m))) AS BIGINT) + 1 END AS rho
           FROM hh),
         ag AS (SELECT lang, reg, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
         g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_regs_set,
           list_reduce(list_prepend(0.0, list(power(0.5, rho) ORDER BY reg)), (a, b) -> a + b) AS sp
           FROM ag GROUP BY 1),
         e AS (SELECT lang, n_regs_set, $m - n_regs_set AS zeros,
           $alphaM2 / (sp + CAST($m - n_regs_set AS DOUBLE)) AS raw
           FROM g)
         SELECT lang, n_regs_set, CAST(zeros AS BIGINT) AS zeros,
           CAST(CASE WHEN raw <= ${2.5 * m} AND zeros > 0 THEN ($lut)[CAST(zeros AS INT)]
                ELSE CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) END AS BIGINT) AS est_micro
         FROM e ORDER BY lang"""
    },
    "q114_phrase_search" ->
      s"""WITH d AS (SELECT doc_id, ${tokens("text")} AS toks FROM documents),
         occ AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, unnest(toks) AS tok FROM d),
         l0 AS (SELECT doc_id, pos AS s FROM occ WHERE tok = 'table'),
         l1 AS (SELECT doc_id, pos - 1 AS s FROM occ WHERE tok = 'hash')
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
         FROM (SELECT l0.doc_id, l0.s FROM l0 JOIN l1 ON l0.doc_id = l1.doc_id AND l0.s = l1.s) t
         GROUP BY doc_id ORDER BY doc_id""",
    "q108_index_search" ->
      s"""WITH occ AS (SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents),
         tf AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
                FROM occ WHERE tok IN ('dup', 'vector', 'merge') GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum
         FROM tf GROUP BY doc_id HAVING COUNT(*) = 3 ORDER BY doc_id""",
    "q123_waterfill_budget" -> {
      val T = 20000L
      s"""WITH sup AS (
           SELECT source, CAST(SUM(len(${tokens("text")})) AS BIGINT) AS supply
           FROM documents GROUP BY 1
         ), rk AS (
           SELECT source, supply,
             CAST(ROW_NUMBER() OVER (ORDER BY supply, source) AS BIGINT) AS k,
             CAST(SUM(supply) OVER (ORDER BY supply, source
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx,
             CAST(COUNT(*) OVER () AS BIGINT) AS s_n
           FROM sup
         ), fl AS (
           SELECT *, CASE WHEN supply <= ($T - (pfx - supply)) // (s_n - k + 1)
             THEN 1 ELSE 0 END AS is_full
           FROM rk
         ), pa AS (
           SELECT *, MIN(is_full) OVER (ORDER BY supply, source
             ROWS UNBOUNDED PRECEDING) AS pall
           FROM fl
         ), st AS (
           SELECT COALESCE(MAX(CASE WHEN pall = 1 THEN k END), 0) AS kf,
             COALESCE(MAX(CASE WHEN pall = 1 THEN pfx END), 0) AS p_kf,
             MAX(s_n) AS s_n
           FROM pa
         ), st2 AS (
           SELECT kf, p_kf, s_n,
             CASE WHEN s_n = kf THEN 0 ELSE ($T - p_kf) // (s_n - kf) END AS lvl,
             CASE WHEN s_n = kf THEN 0 ELSE ($T - p_kf) % (s_n - kf) END AS rem
           FROM st
         ), cr AS (
           SELECT pa.source, pa.supply, pa.k, st2.kf, st2.lvl, st2.rem,
             CASE WHEN pa.k <= st2.kf THEN 0
               ELSE CAST(ROW_NUMBER() OVER (PARTITION BY (pa.k <= st2.kf)
                 ORDER BY pa.source) AS BIGINT) END AS cap_rk
           FROM pa, st2
         )
         SELECT source, supply,
           CAST(CASE WHEN k <= kf THEN supply
             ELSE lvl + CASE WHEN cap_rk <= rem THEN 1 ELSE 0 END END AS BIGINT) AS alloc
         FROM cr ORDER BY source"""
    },
    "q122_bool_search" ->
      s"""WITH occ AS (SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents),
         tf AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
                FROM occ WHERE tok IN ('dup', 'vector') GROUP BY 1, 2),
         hits AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum
                  FROM tf GROUP BY doc_id HAVING COUNT(*) = 2),
         neg AS (SELECT DISTINCT doc_id FROM occ WHERE tok = 'merge')
         SELECT doc_id, tf_sum FROM hits
         WHERE doc_id NOT IN (SELECT doc_id FROM neg) ORDER BY doc_id""",
    // q30's oracle with the near-dup exclusion applied to the UNROUNDED
    // cosine before ranking, exactly as the Spark filter runs
    "q104_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosine("q.embedding", "c.embedding")} AS cos
           FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored WHERE cos < 0.3
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk""",
    "q110_ann_pq" -> pqAdcOracle(Similarity.PqSubspaces, 10),
    // the projection matrix is the shared planeWeight fragment; each
    // output component folds the 64 input dims in order, then q30's
    // ranking runs over the projected vectors
    "q119_ann_projected" -> {
      val proj =
        s"""list_transform(range(0, 16), p ->
           CAST(list_reduce(list_prepend(0.0, list_transform(range(0, 64), jd ->
             CAST(embedding[jd+1] AS DOUBLE) * ${planeWeight("p", "jd", Similarity.Dim)})),
             (x, y) -> x + y) AS REAL))"""
      s"""WITH pr AS (SELECT vec_id, $proj AS embedding FROM embeddings),
         q AS (SELECT vec_id, embedding FROM pr WHERE vec_id < 3),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosine("q.embedding", "c.embedding")} AS cos
           FROM q JOIN pr c ON q.vec_id <> c.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },
    "q105_orc_roundtrip" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         CAST(bit_xor(${polyHash("text")}) AS BIGINT) AS content_xor,
         CAST(ceil(COUNT(*) / 100.0) AS BIGINT) AS n_files
         FROM documents""",
    "q106_csv_roundtrip" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         CAST(bit_xor(${polyHash("text")}) AS BIGINT) AS content_xor,
         CAST(ceil(COUNT(*) / 100.0) AS BIGINT) AS n_files
         FROM documents""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         SUM(l_quantity) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         SUM(l_quantity) / COUNT(*) AS avg_qty,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_agg" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q04_window_topn" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey) t
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "q05_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
         SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q06_set_ops" ->
      """(SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "q07_semi_anti" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_no_orders
         FROM customer WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1 ORDER BY 1""",
    "q08_scalar_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         upper(o_orderpriority) AS pri_upper,
         substring(o_orderpriority, 1, 3) AS pri_pfx,
         CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_bucket,
         o_orderstatus || '-' || o_orderpriority AS tag
         FROM orders ORDER BY o_orderkey""",
    "q09_limit_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT * FROM lineitem LIMIT 1234) t",
    "q10_table_counts" ->
      """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customer""",
    "q16_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice, 1) OVER w1 AS prev_price,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total,
         CAST(RANK() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
         FROM orders WHERE o_custkey < 200
         WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q17_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
         SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q18_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
           (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey) >
           (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i
            WHERE i.o_custkey = o.o_custkey) * 2
         ORDER BY o_orderkey""",
    "q19_pivot" ->
      """SELECT CAST(hour(ts) AS BIGINT) AS hr,
         CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
         CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
         CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
         CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q11_json" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS sum_k,
         CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
         FROM (SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
         GROUP BY 1 ORDER BY 1""",
    "q12_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q13_sliding" ->
      """SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events FROM (
           SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
         ) t GROUP BY 1 ORDER BY 1""",
    "q14_sessions" ->
      """WITH marked AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), numbered AS (
           SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked
         )
         SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
         FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q15_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, s.ts AS last_signup_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts
         ORDER BY p.event_id""",
    "q20_dedup_exact" ->
      """SELECT MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY text ORDER BY canonical_id""",
    "q21_token_stats" -> {
      val tok = tokens("text")
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len($tok)) AS BIGINT) AS sum_tokens,
         CAST(SUM(len(list_distinct($tok))) AS BIGINT) AS sum_distinct_tokens,
         CAST(SUM(len($tok)) AS DOUBLE) / COUNT(*) AS avg_tokens
         FROM documents GROUP BY 1 ORDER BY 1"""
    },
    "q22_quality" -> {
      val tok = tokens("text")
      val nTok = s"len($tok)"
      val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
      val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
      val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
      val avgTokLen = s"(CAST(length(text) - ($nTok - 1) AS DOUBLE) / CAST($nTok AS DOUBLE))"
      val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
      val stopScore = s"least(1.0, $stopRatio * 5.0)"
      val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
      val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
      s"""SELECT doc_id,
         CAST($nTok AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '${TextFunctions.BpeRegex}')) AS BIGINT) AS n_bpe,
         CAST($nPunct AS BIGINT) AS n_punct,
         round($stopRatio, 6) AS stop_ratio,
         round($avgTokLen, 6) AS avg_token_len,
         round(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore, 6) AS quality
         FROM documents ORDER BY doc_id"""
    },
    "q23_langid" -> {
      val en = stopwordHits("text", TextFunctions.StopwordsEn)
      val de = stopwordHits("text", TextFunctions.StopwordsDe)
      val fr = stopwordHits("text", TextFunctions.StopwordsFr)
      val es = stopwordHits("text", TextFunctions.StopwordsEs)
      val pred =
        s"""CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en > 0 THEN 'en'
           WHEN $de >= $fr AND $de >= $es AND $de > 0 THEN 'de'
           WHEN $fr >= $es AND $fr > 0 THEN 'fr'
           WHEN $es > 0 THEN 'es'
           ELSE 'unknown' END"""
      s"""SELECT predicted, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         FROM (SELECT $pred AS predicted, lang FROM documents) t
         GROUP BY 1 ORDER BY 1"""
    },
    "q24_fingerprint" ->
      s"SELECT doc_id, ${polyHash("text")} AS fp FROM documents ORDER BY doc_id",
    "q25_minhash_pairs" -> {
      val r = Dedup.RowsPerBand
      s"""WITH sig AS (
           SELECT doc_id, ${minhashSignature("text")} AS sig,
             ${shingleHashesDistinct("text")} AS sh
           FROM documents
         ), bands AS (
           SELECT doc_id, b, array_to_string(sig[b*$r+1:b*$r+$r], '_') AS band_key
           FROM sig, unnest(range(0, ${Dedup.Bands})) AS t(b)
         ), cand AS (
           SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
           FROM bands l JOIN bands r
             ON l.b = r.b AND l.band_key = r.band_key AND l.doc_id < r.doc_id
         )
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT doc_a, doc_b, round(${jaccard("sa.sh", "sb.sh")}, 6) AS jaccard
           FROM cand
           JOIN sig sa ON doc_a = sa.doc_id
           JOIN sig sb ON doc_b = sb.doc_id) v
         WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"""
    },
    "q26_ngram_jaccard" -> {
      val r = Dedup.RowsPerBandFine
      s"""WITH sig AS (
           SELECT doc_id, ${minhashSignature("text")} AS sig,
             ${shingleHashesDistinct("text")} AS sh
           FROM documents
         ), bands AS (
           SELECT doc_id, b, array_to_string(sig[b*$r+1:b*$r+$r], '_') AS band_key
           FROM sig, unnest(range(0, ${Dedup.BandsFine})) AS t(b)
         ), cand AS (
           SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
           FROM bands l JOIN bands r
             ON l.b = r.b AND l.band_key = r.band_key AND l.doc_id < r.doc_id
         )
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT doc_a, doc_b, round(${jaccard("sa.sh", "sb.sh")}, 6) AS jaccard
           FROM cand
           JOIN sig sa ON doc_a = sa.doc_id
           JOIN sig sb ON doc_b = sb.doc_id) v
         WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b"""
    },
    "q27_simhash" -> {
      val sums = (0 until 32).map(i => s"SUM((h >> $i) & 1) AS s$i").mkString(", ")
      val bits = (0 until 32)
        .map(i => s"(CASE WHEN 2*s$i >= n THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH tok AS (
           SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents
         ), h0 AS (
           SELECT doc_id, ${polyHash("tok")} AS ph FROM tok
         ), h AS (
           SELECT doc_id, ${remix32("ph")} AS h FROM h0
         ), agg AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, $sums FROM h GROUP BY doc_id
         )
         SELECT doc_id, ($bits) AS simhash FROM agg ORDER BY doc_id"""
    },
    "q39_simhash_weighted" -> {
      val sums = (0 until 32).map(i => s"SUM(((h >> $i) & 1) * w) AS s$i").mkString(", ")
      val bits = (0 until 32)
        .map(i => s"(CASE WHEN 2*s$i >= wsum THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH tok AS (
           SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents
         ), h0 AS (
           SELECT doc_id, ${polyHash("tok")} AS ph, CAST(length(tok) AS BIGINT) AS w FROM tok
         ), h AS (
           SELECT doc_id, ${remix32("ph")} AS h, w FROM h0
         ), agg AS (
           SELECT doc_id, CAST(SUM(w) AS BIGINT) AS wsum, $sums FROM h GROUP BY doc_id
         )
         SELECT doc_id, ($bits) AS simhash FROM agg ORDER BY doc_id"""
    },
    "q29_simhash_pairs" -> {
      val sums = (0 until 32).map(i => s"SUM((h >> $i) & 1) AS s$i").mkString(", ")
      val bits = (0 until 32)
        .map(i => s"(CASE WHEN 2*s$i >= n THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH tok AS (
           SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents
         ), h0 AS (
           SELECT doc_id, ${polyHash("tok")} AS ph FROM tok
         ), h AS (
           SELECT doc_id, ${remix32("ph")} AS h FROM h0
         ), agg AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, $sums FROM h GROUP BY doc_id
         ), sh AS (
           SELECT doc_id, ($bits) AS simhash FROM agg
         )
         SELECT doc_a, doc_b, hamming FROM (
           SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
             CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
           FROM sh l JOIN sh r ON l.doc_id < r.doc_id) v
         WHERE hamming <= 2 ORDER BY doc_a, doc_b"""
    },
    // vocab/OOV: top-V by (tf desc, tok) — the tie at the V boundary is
    // broken by the token string, identical on both engines; permille in
    // integer arithmetic
    "q81_vocab_oov" ->
      s"""WITH tf AS (
           SELECT tok, COUNT(*) AS tf
           FROM (SELECT unnest(${tokens("text")}) AS tok FROM documents) t0
           GROUP BY 1
         ), v AS (
           SELECT tok, 1 AS inv FROM (
             SELECT tok, ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS r FROM tf
           ) rk WHERE r <= 1000
         ), t AS (
           SELECT doc_id, unnest(${tokens("text")}) AS tok FROM documents
         )
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
             AS oov_permille
         FROM t LEFT JOIN v USING (tok)
         GROUP BY 1 ORDER BY 1""",
    // substring dedup: sliding positional window STRINGS (text identity,
    // not hashes — the operator deletes text, so collisions are not
    // acceptable), first occurrence by the (doc_id, i) total order via
    // ROW_NUMBER (== Spark's min(struct)), per-doc cut intervals in list
    // lambdas
    "q80_substring_dedup" -> {
      val ws = positionalShingles("text", 6)
      s"""WITH toks AS (
           SELECT doc_id, ${tokens("text")} AS t, $ws AS ws FROM documents
         ), occ AS (
           SELECT doc_id, unnest(range(0, len(ws))) AS i, unnest(ws) AS w
           FROM toks
         ), r AS (
           SELECT doc_id, i, w,
             ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn,
             COUNT(*) OVER (PARTITION BY w) AS n_occ
           FROM occ
         ), cuts AS (
           SELECT doc_id, list_sort(list(i)) AS cuts
           FROM r WHERE n_occ > 1 AND rn > 1 GROUP BY doc_id
         ), rebuilt AS (
           SELECT t.doc_id,
             array_to_string(
               list_transform(
                 list_filter(range(0, len(t.t)),
                   x -> len(list_filter(coalesce(c.cuts, CAST([] AS BIGINT[])),
                     s -> s <= x AND x < s + 6)) = 0),
                 x -> (t.t)[x + 1]),
               ' ') AS text
           FROM toks t LEFT JOIN cuts c USING (doc_id)
         )
         SELECT doc_id, text FROM rebuilt
         WHERE length(text) > 0 ORDER BY doc_id"""
    },
    // leakage-safe split: q32's cluster labels, then the whole cluster
    // assigned by the REPRESENTATIVE's content hash (rep = the doc whose
    // id equals the min-label cluster id)
    "q79_split_by_cluster" -> {
      val r = Dedup.RowsPerBand
      s"""WITH RECURSIVE ${clusterChain("documents")}, rep AS (
           SELECT doc_id AS cluster_id, ${polyHash("text")} AS rh FROM documents
         )
         SELECT cc.doc_id, cc.cluster_id,
           CASE WHEN rh % 100 < 80 THEN 'train' ELSE 'val' END AS split
         FROM cc JOIN rep USING (cluster_id) ORDER BY cc.doc_id"""
    },
    "q32_dedup_clusters" -> {
      val r = Dedup.RowsPerBand
      s"""WITH RECURSIVE ${clusterChain("documents")}
         SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""
    },
    // the cluster chain's pair graph, then 3 unrolled integer power-
    // iteration rounds (cent' = 150000 + inc*17//20) and the per-cluster
    // (cent desc, id) argmax — every round replays the Spark arithmetic
    "q121_dedup_central" -> {
      def round(t: Int): String =
        s""", inc$t AS (
           SELECT e.d AS doc_id, CAST(SUM(sc.cent // deg.dg) AS BIGINT) AS inc
           FROM edges2 e JOIN sc${t - 1} sc ON sc.doc_id = e.s JOIN deg ON deg.s = e.s
           GROUP BY 1
         ), sc$t AS (
           SELECT d0.doc_id,
             CAST(150000 + coalesce(inc, 0) * 17 // 20 AS BIGINT) AS cent
           FROM documents d0 LEFT JOIN inc$t USING (doc_id)
         )"""
      s"""WITH RECURSIVE ${clusterChain("documents")},
         edges2 AS (
           SELECT doc_a AS s, doc_b AS d FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
         ), deg AS (
           SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM edges2 GROUP BY 1
         ), sc0 AS (
           SELECT doc_id, CAST(1000000 AS BIGINT) AS cent FROM documents
         )${(1 to 3).map(round).mkString}, rep AS (
           SELECT cluster_id, doc_id AS rep_id FROM (
             SELECT cc.cluster_id, cc.doc_id,
               ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
                 ORDER BY sc3.cent DESC, cc.doc_id) AS r
             FROM cc JOIN sc3 ON sc3.doc_id = cc.doc_id) t WHERE r = 1
         )
         SELECT sc3.doc_id, cc.cluster_id, sc3.cent AS cent_micro,
           (cc.doc_id = rep.rep_id) AS keep
         FROM sc3 JOIN cc ON cc.doc_id = sc3.doc_id
         JOIN rep ON rep.cluster_id = cc.cluster_id
         ORDER BY sc3.doc_id"""
    },
    "q38_dedup_clusters_star" -> {
      val r = Dedup.RowsPerBand
      s"""WITH RECURSIVE ${clusterChain("documents")}
         SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""
    },
    "q36_dedup_near" -> {
      val r = Dedup.RowsPerBand
      s"""WITH RECURSIVE ${clusterChain("documents")}, sizes AS (
           SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM cc GROUP BY 1
         )
         SELECT c.doc_id, s.n_members FROM cc c JOIN sizes s ON c.cluster_id = s.cluster_id
         WHERE c.doc_id = c.cluster_id ORDER BY c.doc_id"""
    },
    // q36's clustering CTE + q22's quality formula; representative = argmax
    // score with min-doc_id tie-break (ROW_NUMBER ordered score DESC, doc_id)
    "q42_dedup_best" -> {
      val r = Dedup.RowsPerBand
      val tok = tokens("text")
      val nTok = s"len($tok)"
      val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
      val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
      val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
      val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
      val stopScore = s"least(1.0, $stopRatio * 5.0)"
      val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
      val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
      s"""WITH RECURSIVE ${clusterChain("documents")}, scored AS (
           SELECT doc_id,
             round(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore, 6) AS score
           FROM documents
         ), ranked AS (
           SELECT c.cluster_id, c.doc_id, s.score,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY s.score DESC, c.doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS n_members
           FROM cc c JOIN scored s ON c.doc_id = s.doc_id
         )
         SELECT cluster_id, doc_id, score, n_members
         FROM ranked WHERE rn = 1 ORDER BY cluster_id"""
    },
    "q59_quality_checks" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_custkey,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_orderdate,
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_orphans
         FROM orders""",
    "q60_sequence_pack" ->
      s"""WITH t AS (
           SELECT doc_id, ${tokens("text")} AS toks FROM documents
         ), c AS (
           SELECT doc_id, i AS chunk_idx,
             CAST(len(string_split(array_to_string(toks[i*56+1:i*56+64], ' '), ' ')) AS BIGINT) AS n_tok
           FROM t, unnest(range(0, greatest(CAST(ceil(len(toks) / 56.0) AS INT), 1))) AS u(i)
         ), r AS (
           SELECT doc_id, chunk_idx, n_tok,
             SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c
         )
         SELECT doc_id, CAST((cum - n_tok) // 96 AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    "q61_winnow" ->
      s"""WITH h AS (
           SELECT doc_id, ${positionalShingleHashes("text", Dedup.ShingleK)} AS hs FROM documents
         ), wn AS (
           SELECT doc_id, ${winnowFromHashes("hs", Dedup.WinnowW)} AS fp FROM h
         )
         SELECT doc_id,
           CAST(len(fp) AS BIGINT) AS n_fp,
           list_min(fp) AS fp_min,
           list_max(fp) AS fp_max,
           list_reduce(list_prepend(CAST(0 AS BIGINT), fp), (a, x) -> xor(a, x)) AS fp_xor
         FROM wn ORDER BY doc_id""",
    "q62_copy_pairs" ->
      s"""WITH h AS (
           SELECT doc_id, ${positionalShingleHashes("text", Dedup.ShingleK)} AS hs FROM documents
         ), wn AS (
           SELECT doc_id, ${winnowFromHashes("hs", Dedup.WinnowW)} AS fp FROM h
         ), f AS (
           SELECT doc_id, unnest(fp) AS fp FROM wn
         ), rare AS (
           SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= ${Dedup.WinnowMaxDf}
         ), kept AS (
           SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp)
         )
         SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
         FROM kept l JOIN kept r ON l.fp = r.fp AND l.doc_id < r.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= ${Dedup.WinnowMinShared} ORDER BY 1, 2""",
    "q63_balanced_sample" ->
      s"""WITH s0 AS (
           SELECT lang, doc_id, ${polyHash("text")} AS h FROM documents
         ), s AS (
           SELECT lang, doc_id, h,
             row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rn
           FROM s0
         )
         SELECT lang, doc_id, h FROM s WHERE rn <= 20 ORDER BY lang, doc_id""",
    "q64_pack_across" ->
      s"""WITH s0 AS (
           SELECT doc_id, ${polyHash("text")} AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents
         ), nb AS (
           SELECT CAST(greatest(1, (COUNT(*) + 63) // 64) AS BIGINT) AS n_buckets FROM s0
         ), s AS (
           SELECT doc_id, h, n_tok, h % n_buckets AS bucket,
             SUM(n_tok) OVER (PARTITION BY h % n_buckets ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM s0, nb
         )
         SELECT bucket, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    // composed pipeline: q22's quality formula gates scrubbed text, q20's
    // exact dedup, q42's LSH+clustering+argmax-rep chain, q63's balanced
    // rank, then q60's chunk+pack windows — one CTE chain end to end
    "q65_training_pipeline" -> {
      val r = Dedup.RowsPerBand
      val tok = tokens("text")
      val nTok = s"len($tok)"
      val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
      val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
      val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
      val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
      val stopScore = s"least(1.0, $stopRatio * 5.0)"
      val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
      val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
      val quality = s"(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore)"
      s"""WITH RECURSIVE scrubbed AS (
           SELECT doc_id, lang,
             regexp_replace(regexp_replace(text, '${TextFunctions.EmailRegex}', '<email>', 'g'),
               '${TextFunctions.LongNumberRegex}', '<num>', 'g') AS text
           FROM documents
         ), qual AS (
           SELECT doc_id, lang, text FROM scrubbed WHERE $quality >= 0.4275
         ), ex AS (
           SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY text
         ), exd AS (
           SELECT qual.doc_id, qual.lang, qual.text FROM qual JOIN ex USING (doc_id)
         ), ${clusterChain("exd")}, scored AS (
           -- round to 6 dp like the fused kernel (and q42's oracle): the
           -- engine ranks representatives by the ROUNDED score, so an
           -- unrounded ORDER BY here could pick a different rep when two
           -- members' raw scores differ by < 1e-6
           SELECT doc_id, round($quality, 6) AS score FROM exd
         ), ranked AS (
           SELECT c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY s.score DESC, c.doc_id) AS rn
           FROM cc c JOIN scored s ON c.doc_id = s.doc_id
         ), surv AS (
           SELECT exd.doc_id, exd.lang, exd.text
           FROM exd JOIN ranked ON exd.doc_id = ranked.doc_id AND ranked.rn = 1
         ), bal0 AS (
           SELECT lang, doc_id, ${polyHash("text")} AS h FROM surv
         ), bal AS (
           SELECT doc_id FROM (
             SELECT doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rn
             FROM bal0) b
           WHERE rn <= 40
         ), samp AS (
           SELECT surv.doc_id, surv.lang, surv.text FROM surv JOIN bal USING (doc_id)
         ), tt AS (
           SELECT doc_id, lang, $tok AS toks FROM samp
         ), chnk AS (
           SELECT doc_id, lang, i AS chunk_idx,
             CAST(len(string_split(array_to_string(toks[i*56+1:i*56+64], ' '), ' ')) AS BIGINT) AS n_tok
           FROM tt, unnest(range(0, greatest(CAST(ceil(len(toks) / 56.0) AS INT), 1))) AS u(i)
         ), run AS (
           SELECT doc_id, lang, chunk_idx, n_tok,
             SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM chnk
         )
         SELECT doc_id, lang, CAST((cum - n_tok) // 96 AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM run GROUP BY 1, 2, 3 ORDER BY 1, 3"""
    },
    // hygiene-composed pipeline: the q65 chain with the repetition filter
    // (rounded fractions, like the engine), benchmark decontamination
    // (scrubbed both sides), and the sqrt-temperature mix replacing the
    // fixed balanced sample — seven mirrored stages in one CTE chain
    "q82_hygienic_pipeline" -> {
      val tok = tokens("text")
      s"""WITH RECURSIVE $hygienicChainCtes, tt AS (
           SELECT doc_id, lang, $tok AS toks FROM samp
         ), chnk AS (
           SELECT doc_id, lang, i AS chunk_idx,
             CAST(len(string_split(array_to_string(toks[i*56+1:i*56+64], ' '), ' ')) AS BIGINT) AS n_tok
           FROM tt, unnest(range(0, greatest(CAST(ceil(len(toks) / 56.0) AS INT), 1))) AS u(i)
         ), run AS (
           SELECT doc_id, lang, chunk_idx, n_tok,
             SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM chnk
         )
         SELECT doc_id, lang, CAST((cum - n_tok) // 96 AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM run GROUP BY 1, 2, 3 ORDER BY 1, 3"""
    },
    // the same chain CTEs, with each stage boundary counted once and the
    // funnel rows assembled by UNION ALL (fixed 7-row shape)
    "q109_attrition" -> {
      val stages = Seq(
        ("gopher", "scrubbed", "gph"),
        ("quality", "gph", "qual"),
        ("repetition", "qual", "nonrep"),
        ("decontamination", "nonrep", "cleand"),
        ("exact_dedup", "cleand", "exd"),
        ("near_dedup", "exd", "surv"),
        ("mix", "surv", "samp")
      )
      val rows = stages.zipWithIndex
        .map { case ((stage, in, out), i) =>
          s"""SELECT CAST(${i + 1} AS BIGINT) AS stage_idx, '$stage' AS stage,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM $in) AS n_in,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM $in)
               - (SELECT CAST(COUNT(*) AS BIGINT) FROM $out) AS n_dropped,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM $out) AS n_out"""
        }
        .mkString(" UNION ALL ")
      s"""WITH RECURSIVE $hygienicChainCtes
         SELECT * FROM ($rows) ORDER BY stage_idx"""
    },
    // eval exposure: per-bench-doc distinct (corpus doc, gram) joins on
    // the shared 4-gram hash, both sides' window sets per-doc distinct
    "q99_bench_exposure" ->
      s"""WITH split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), bench AS (
           SELECT doc_id AS bench_id, unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b >= 8
         ), corp AS (
           SELECT doc_id, unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b < 8
         )
         SELECT bench_id,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_corpus_docs,
           CAST(COUNT(DISTINCT gh) AS BIGINT) AS n_shared_grams
         FROM corp JOIN bench USING (gh)
         GROUP BY 1 ORDER BY bench_id""",
    // span decontamination: q66's content-hash split and benchmark gram
    // index, q80's keep-token rebuild — token x survives iff no
    // benchmark-shared window [s, s+4) covers it
    "q96_redact_overlaps" -> {
      val hs = positionalShingleHashes("text", 4)
      s"""WITH split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), bench AS (
           SELECT DISTINCT unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b >= 8
         ), toks AS (
           SELECT doc_id, ${tokens("text")} AS t, $hs AS hs
           FROM split WHERE b < 8
         ), occ AS (
           SELECT doc_id, unnest(range(0, len(hs))) AS i, unnest(hs) AS gh
           FROM toks
         ), cuts AS (
           SELECT doc_id, list_sort(list(i)) AS cuts
           FROM occ JOIN bench USING (gh) GROUP BY doc_id
         ), rebuilt AS (
           SELECT t.doc_id,
             array_to_string(
               list_transform(
                 list_filter(range(0, len(t.t)),
                   x -> len(list_filter(coalesce(c.cuts, CAST([] AS BIGINT[])),
                     s -> s <= x AND x < s + 4)) = 0),
                 x -> (t.t)[x + 1]),
               ' ') AS text
           FROM toks t LEFT JOIN cuts c USING (doc_id)
         )
         SELECT doc_id, text FROM rebuilt
         WHERE length(text) > 0 ORDER BY doc_id"""
    },
    // DSIR resampling: bigram-hashed weights (q92 arithmetic at k=2),
    // then systematic ∝-weight selection — cumulative weight in
    // poly_hash(id:seed) order, a document selected iff an equally-
    // spaced boundary of the total mass lands in its interval; the
    // engine's two-phase bucketed prefix sum collapses to one window
    "q95_dsir_resample" -> {
      val B = graft.operators.Importance.DefaultBuckets
      val S = graft.operators.Importance.Scale
      s"""WITH tb AS (
           SELECT doc_id, lang,
             unnest(${positionalShingleHashes("text", 2)}) % $B AS b
           FROM documents
         ), tc AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tb WHERE lang = 'en' GROUP BY 1
         ), rcn AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1
         ), w AS (
           SELECT coalesce(tc.b, rcn.b) AS b,
             ((coalesce(ct, 0) + 1) * $S) // (coalesce(cr, 0) + 1) AS w
           FROM tc FULL JOIN rcn ON tc.b = rcn.b
         ), imp AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(coalesce(w, $S)) // COUNT(*) AS BIGINT) AS imp_avg
           FROM tb LEFT JOIN w USING (b) WHERE lang <> 'en' GROUP BY 1
         ), tot AS (
           SELECT SUM(imp_avg) AS wt FROM imp
         ), ih0 AS (
           SELECT doc_id, n_toks, imp_avg,
             ${polyHash("(CAST(doc_id AS VARCHAR) || ':7')")} AS h0
           FROM imp
         ), cum AS (
           SELECT doc_id, n_toks, imp_avg,
             SUM(imp_avg) OVER (
               ORDER BY ${remix32("h0")}, doc_id
               ROWS UNBOUNDED PRECEDING) AS c
           FROM ih0
         )
         SELECT doc_id, n_toks, imp_avg,
           CAST((c * 50) // wt AS BIGINT) AS sel_idx
         FROM cum, tot
         WHERE (c * 50) // wt > ((c - imp_avg) * 50) // wt
         ORDER BY doc_id"""
    },
    // the mixing pipeline: the q82 front half (scrub/Gopher/quality/
    // exact+near dedup) then DSIR weights trained target-vs-survivors,
    // mean-relative importance cutoff, temperature mix on lang, q93's
    // per-source running-total budget, and q89's shard plan — one
    // recursive CTE chain end to end
    "q94_mix_pipeline" ->
      s"""$mixPipelineCtes
         SELECT adm.doc_id, lang, source, n_tok, cum_tok,
           CAST(h % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, adm.doc_id) AS BIGINT) AS position
         FROM adm JOIN ph ON adm.doc_id = ph.doc_id
         ORDER BY adm.doc_id""",
    // the MATERIALIZED mixing artifact: q94's chain plus the scrubbed
    // text each admitted document carries into its shard file — the
    // Spark side answers from the files it wrote and read back, so a
    // hash match here verifies the artifact, not the intent
    "q97_mix_roundtrip" ->
      s"""$mixPipelineCtes
         SELECT adm.doc_id, lang, source, n_tok, cum_tok,
           CAST(h % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, adm.doc_id) AS BIGINT) AS position,
           text
         FROM adm JOIN ph ON adm.doc_id = ph.doc_id
         ORDER BY adm.doc_id""",
    // decontamination: same content-hash split, distinct 4-gram hashes per
    // side, shared-gram count per corpus doc
    // semantic-decon replay: cross join corpus x bench slices, max
    // cosine per corpus vector, quantize AFTER the (order-free) max
    "q146_semantic_decon" ->
      s"""WITH corp AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 9
         ), bench AS (
           SELECT embedding AS b_emb FROM embeddings WHERE vec_id % 10 = 9
         ), scored AS (
           SELECT c.vec_id, ${cosine("c.embedding", "b.b_emb")} AS cos
           FROM corp c CROSS JOIN bench b
         ), agg AS (
           SELECT vec_id,
             CAST(floor(MAX(cos) * 1000000 + 0.5) AS BIGINT) AS max_cos_micro
           FROM scored GROUP BY vec_id
         )
         SELECT vec_id, max_cos_micro, max_cos_micro >= 800000 AS flagged
         FROM agg ORDER BY vec_id""",
    // banded-semantic replay: both slices' bucket lists unnested, the
    // (table, bucket) equi-join, max per corpus vector, LEFT JOIN keeps
    // candidate-less vectors with NULL
    "q147_semantic_decon_lsh" -> {
      val L = Similarity.LshTables
      val w = Similarity.LshPlanesPerTable
      val buckets = lshBucketsList("embedding", L, w, Similarity.Dim)
      s"""WITH corp AS (
           SELECT vec_id, embedding, $buckets AS buckets
           FROM embeddings WHERE vec_id % 10 <> 9
         ), cbt AS (
           SELECT vec_id, embedding, t, buckets[t+1] AS bucket
           FROM corp, unnest(range(0, $L)) AS tt(t)
         ), ben AS (
           SELECT embedding AS b_emb, $buckets AS buckets
           FROM embeddings WHERE vec_id % 10 = 9
         ), bbt AS (
           SELECT b_emb, t, buckets[t+1] AS bucket
           FROM ben, unnest(range(0, $L)) AS tt(t)
         ), scored AS (
           SELECT c.vec_id, ${cosine("c.embedding", "b.b_emb")} AS cos
           FROM cbt c JOIN bbt b ON c.t = b.t AND c.bucket = b.bucket
         ), agg AS (
           SELECT vec_id,
             CAST(floor(MAX(cos) * 1000000 + 0.5) AS BIGINT) AS max_cos_micro
           FROM scored GROUP BY 1
         )
         SELECT c0.vec_id, agg.max_cos_micro,
           COALESCE(agg.max_cos_micro >= 800000, false) AS flagged
         FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 9) c0
         LEFT JOIN agg USING (vec_id)
         ORDER BY c0.vec_id"""
    },
    // unigram-LM replay: seed inventory + two unrolled Viterbi chains
    // (12 materialized positions each) + count/prune — the final piece
    // table and the per-doc profile off the segB artifact
    "q152_unigram_pieces" ->
      s"""${unigramChain(48, 24, 4, 12)}
         SELECT s AS piece, num FROM p1 ORDER BY piece""",
    "q153_unigram_profile" ->
      s"""${unigramChain(48, 24, 4, 12)},
         dw AS (
           SELECT doc_id, w FROM (
             SELECT doc_id, unnest(${tokens("text")}) AS w FROM documents) t9
           WHERE length(w) > 0
         )
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(sg.syms)) AS BIGINT) AS n_subwords
         FROM dw JOIN segB sg ON sg.w = dw.w
         GROUP BY 1 ORDER BY doc_id""",
    // classifier replay: per-bucket class counts off the labeled mod-3
    // slices, complete numBuckets-row weight table (HUGEINT products
    // mirror the decimal(38,0) side), held-out docs scored by mean w
    "q150_quality_classifier" ->
      s"""$classifierCtes,
         sc AS (SELECT doc_id, w.w AS w FROM fb JOIN w USING (b) WHERE cls = 2)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(w) // COUNT(*) AS BIGINT) AS q_micro
         FROM sc GROUP BY 1 ORDER BY doc_id""",
    // the learned calibrated keep: the q145 from-above rule over the
    // classifier score instead of the formula score
    "q151_keep_top_learned" ->
      s"""$classifierCtes,
         sc AS (SELECT doc_id, w.w AS w FROM fb JOIN w USING (b)),
         per AS (
           SELECT doc_id, CAST(SUM(w) // COUNT(*) AS BIGINT) AS q_micro
           FROM sc GROUP BY 1
         ),
         scored AS (
           SELECT d.doc_id, d.source, p.q_micro
           FROM documents d JOIN per p USING (doc_id)
         ),
         hist AS (
           SELECT source, q_micro, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM scored GROUP BY 1, 2
         ),
         ranks AS (
           SELECT source, q_micro,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY q_micro) - cnt AS BIGINT)
               AS n_less,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY q_micro) AS BIGINT) AS n_le
           FROM hist
         ),
         totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY 1)
         SELECT s.doc_id, s.source, s.q_micro,
           CAST(n_less * 1000000 // greatest(n - 1, 1) AS BIGINT) AS pct_micro
         FROM scored s
         JOIN ranks r ON r.source = s.source AND r.q_micro = s.q_micro
         JOIN totals t ON t.source = s.source
         WHERE (n - n_le) * 1000 < 300 * n
         ORDER BY s.doc_id""",
    // language-ID replay: per-language conditional char-trigram counts
    // off the even-id slice, odd-id docs scored by integer rarity under
    // every language, (rarity_avg, lang) argmin picks the prediction
    "q148_lang_id" ->
      s"""${langIdCtes("doc_id % 2 = 1")}
         SELECT doc_id, lang_pred, rarity_avg FROM pick ORDER BY doc_id""",
    // the derived-lang corpus card: the q112 rollup with the assumed
    // label replaced by the langid prediction over ALL documents
    "q149_lang_card" ->
      s"""${langIdCtes("1 = 1")},
         joined AS (
           SELECT d.source, p.lang_pred AS lang, d.text
           FROM documents d JOIN pick p USING (doc_id)
         ), pl AS (
           SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(${tokens("text")})) AS BIGINT) AS n_tokens,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(COUNT(DISTINCT ${polyHash("text")}) AS BIGINT) AS n_distinct
           FROM joined GROUP BY 1, 2
         ), agg AS (
           SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(SUM(n_distinct) AS BIGINT) AS nd
           FROM pl GROUP BY 1
         ), top AS (
           SELECT source, lang AS top_lang FROM (
             SELECT source, lang,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, lang) AS r
             FROM pl) t WHERE r = 1
         )
         SELECT agg.source, n_docs, n_tokens, n_chars, n_langs, top_lang,
           n_tokens * 1000 // n_docs AS mean_tok_milli,
           (n_docs - nd) * 1000 // n_docs AS dup_permille
         FROM agg JOIN top USING (source) ORDER BY source""",
    // memorization replay: positional 4-gram hits against the distinct
    // benchmark index, runs via the gaps-and-islands i - ROW_NUMBER
    // window per doc, LEFT JOIN keeps clean docs at 0/0
    "q154_memorization" ->
      s"""WITH split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), bench AS (
           SELECT DISTINCT unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b >= 8
         ), corp AS (
           SELECT doc_id, i, hs[i] AS gh
           FROM (SELECT doc_id, ${positionalShingleHashes("text", 4)} AS hs
                 FROM split WHERE b < 8) c0,
             unnest(range(1, len(hs) + 1)) AS u(i)
         ), hit AS (
           SELECT doc_id, i FROM corp JOIN bench USING (gh)
         ), runs AS (
           SELECT doc_id, i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
           FROM hit
         ), rl AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run FROM runs GROUP BY doc_id, grp
         ), agg AS (
           SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_hit_windows,
             CAST(MAX(run) + 3 AS BIGINT) AS max_span_tokens
           FROM rl GROUP BY doc_id
         )
         SELECT s.doc_id,
           CAST(COALESCE(n_hit_windows, 0) AS BIGINT) AS n_hit_windows,
           CAST(COALESCE(max_span_tokens, 0) AS BIGINT) AS max_span_tokens
         FROM (SELECT doc_id FROM split WHERE b < 8) s
         LEFT JOIN agg USING (doc_id)
         ORDER BY s.doc_id""",
    // every Bloom bit replayed: benchmark probes OR into 32-bit words of
    // BIGINTs, corpus probes read them back; LEFT JOIN miss = bit unset
    "q135_bloom_decon" -> {
      val P = graft.functions.Kernels.HashPrime
      def affine(src: String) = s"($src * (2*i + 1) + (i*i*31 + 7) % $P) % $P"
      s"""WITH split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), bgh AS (
           SELECT DISTINCT unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b >= 8
         ), bp0 AS (
           SELECT ${affine("gh")} AS h0 FROM bgh, unnest(range(0, 3)) AS u(i)
         ), bpos AS (
           SELECT ${remix32("h0")} % 32768 AS pos FROM bp0
         ), bloom AS (
           SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
           FROM bpos GROUP BY 1
         ), cg AS (
           SELECT doc_id, unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b < 8
         ), cp0 AS (
           SELECT doc_id, gh, ${affine("gh")} AS h0
           FROM cg, unnest(range(0, 3)) AS u(i)
         ), cp AS (
           SELECT doc_id, gh, ${remix32("h0")} % 32768 AS pos FROM cp0
         ), hits AS (
           SELECT doc_id, gh,
             SUM(CASE WHEN (word >> CAST(pos % 32 AS INTEGER)) & 1 = 1
               THEN 1 ELSE 0 END) AS nbit
           FROM cp LEFT JOIN bloom ON bloom.word_idx = pos // 32
           GROUP BY doc_id, gh
         )
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN nbit = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe
         FROM hits GROUP BY doc_id ORDER BY doc_id"""
    },
    "q66_decontaminate" ->
      s"""WITH split AS (
           SELECT doc_id, text, (${polyHash("text")} % 10) AS b FROM documents
         ), bench AS (
           SELECT DISTINCT unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b >= 8
         ), corp AS (
           SELECT doc_id, unnest(${shingleHashesDistinct("text", 4)}) AS gh
           FROM split WHERE b < 8
         )
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM corp JOIN bench USING (gh)
         GROUP BY 1 ORDER BY 1""",
    "q67_repetition" ->
      s"""WITH g AS (
           SELECT doc_id, unnest(${positionalShingleHashes("text", 2)}) AS gh
           FROM documents
         ), c AS (
           SELECT doc_id, gh, COUNT(*) AS c FROM g GROUP BY 1, 2
         ), d AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(COUNT(*) AS BIGINT) AS n_distinct, MAX(c) AS top_count
           FROM c GROUP BY 1
         )
         SELECT doc_id, n_grams, n_distinct,
           round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS dup_frac,
           round(CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS top_frac
         FROM d ORDER BY doc_id""",
    // temperature mix: rate = sqrt(n_min/n_g) — IEEE sqrt is correctly
    // rounded, so floor(rate*1e6) lands on the identical BIGINT threshold
    // in both engines; admission is the shared content-hash predicate
    "q78_temperature_mix" ->
      s"""WITH c AS (
           SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY 1
         ), m AS (
           SELECT MIN(n_g) AS n_min FROM c
         ), r AS (
           SELECT lang,
             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS DOUBLE))
               * 1000000.0) AS BIGINT) AS thr
           FROM c, m
         )
         SELECT doc_id, documents.lang AS lang
         FROM documents JOIN r ON documents.lang IS NOT DISTINCT FROM r.lang
         WHERE (${polyHash("text")} % 1000000) < thr
         ORDER BY doc_id""",
    // int8 ANN: quantization replayed per vector (floor(x*127/s + 0.5) is
    // IEEE-exact), cosine over integer code sums — doubles only at the
    // final divide, so rankings agree bit-for-bit
    "q77_ann_quantized" -> {
      def fold(l: String) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), $l), (x, y) -> x + y)"
      def intCos(a: String, b: String): String = {
        val dot = fold(s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT))")
        val na = fold(s"list_transform($a, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))")
        val nb = fold(s"list_transform($b, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))")
        s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 " +
          s"ELSE CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))) END)"
      }
      s"""WITH base AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
           FROM embeddings
         ), q8 AS (
           SELECT vec_id,
             CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
               ELSE list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT))
             END AS c
           FROM base
         ), q AS (SELECT vec_id, c FROM q8 WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
             ${intCos("q.c", "t.c")} AS cos
           FROM q JOIN q8 t ON q.vec_id <> t.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    // source reputation: q22's quality formula + q74's PII counts fused
    // into one per-source profile; ratios in integer permille (x*1000 //
    // n — left-assoc on both engines) so the profile hashes identically
    "q76_source_reputation" -> {
      val tok = tokens("text")
      val nTok = s"len($tok)"
      val nPunct = s"len(regexp_extract_all(text, '${TextFunctions.PunctRegex}'))"
      val hitsEn = stopwordHits("text", TextFunctions.StopwordsEn)
      val stopRatio = s"(CAST($hitsEn AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE))"
      val lenScore = s"least(1.0, CAST($nTok AS DOUBLE) / 100.0)"
      val stopScore = s"least(1.0, $stopRatio * 5.0)"
      val punctRatio = s"(CAST($nPunct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
      val punctScore = s"(1.0 - least(1.0, $punctRatio * 10.0))"
      val quality = s"(0.5 * $lenScore + 0.3 * $stopScore + 0.2 * $punctScore)"
      val er = TextFunctions.EmailRegex
      val nr = TextFunctions.LongNumberRegex
      s"""WITH q AS (
           SELECT source,
             CAST($nTok AS BIGINT) AS tk,
             CASE WHEN $quality < 0.4275 THEN 1 ELSE 0 END AS lowq,
             CASE WHEN len(regexp_extract_all(text, '$er'))
                    + len(regexp_extract_all(
                        regexp_replace(text, '$er', '<email>', 'g'), '$nr')) > 0
               THEN 1 ELSE 0 END AS pii
           FROM documents
         )
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tk) AS BIGINT) AS total_tokens,
           CAST(SUM(tk) // COUNT(*) AS BIGINT) AS mean_tokens,
           CAST(SUM(lowq) AS BIGINT) AS low_quality_docs,
           CAST(SUM(pii) AS BIGINT) AS pii_docs,
           CAST(SUM(lowq) * 1000 // COUNT(*) AS BIGINT) AS low_permille,
           CAST(SUM(pii) * 1000 // COUNT(*) AS BIGINT) AS pii_permille
         FROM q GROUP BY 1 ORDER BY 1"""
    },
    // bigram-LM rarity: counts replayed per gram hash, add-one smoothing
    // in pure BIGINT arithmetic ((cp+V)*1e6 // (c+1) — no ln(), no double
    // sums, so both engines agree bit-for-bit); the two unnests in
    // `pairs` are same-length and zip positionally, mirroring zip_with
    "q75_lm_rarity" ->
      s"""WITH $lmRarityCtes
         SELECT doc_id, n_grams, n_unseen, rarity_avg
         FROM lmdoc ORDER BY doc_id""",
    // CCNet head/middle/tail perplexity buckets: the q75 scorer's chain
    // plus SAMPLE-derived terciles (1-in-4 id-hash sample, q86
    // lower-quantile convention) and a scan-side CASE assignment
    "q90_rarity_buckets" ->
      s"""WITH $lmRarityCtes, samp AS (
           SELECT rarity_avg FROM lmdoc
           WHERE ${polyHash("CAST(doc_id AS VARCHAR)")} % 4 = 0
         ), hist AS (
           SELECT rarity_avg, CAST(COUNT(*) AS BIGINT) AS c FROM samp GROUP BY 1
         ), cum AS (
           SELECT rarity_avg,
             CAST(SUM(c) OVER (ORDER BY rarity_avg) AS BIGINT) AS cum,
             CAST(SUM(c) OVER () AS BIGINT) AS n
           FROM hist
         ), thr AS (
           SELECT
             MIN(CASE WHEN cum * 3 >= n THEN rarity_avg END) AS t1,
             MIN(CASE WHEN cum * 3 >= n * 2 THEN rarity_avg END) AS t2
           FROM cum
         )
         SELECT doc_id, rarity_avg,
           CASE WHEN rarity_avg <= t1 THEN 'head'
                WHEN rarity_avg <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM lmdoc, thr ORDER BY doc_id""",
    // DSIR importance: hashed-unigram bucket counts target (en) vs raw
    // (rest), per-bucket integer weight ((tc+1)*1e6)//(rc+1), per-doc
    // mean over its token buckets; unseen buckets score the neutral 1e6
    "q92_dsir_importance" ->
      s"""WITH tb AS (
           SELECT doc_id, lang,
             unnest(${positionalShingleHashes("text", 1)}) % ${graft.operators.Importance.DefaultBuckets} AS b
           FROM documents
         ), tc AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tb WHERE lang = 'en' GROUP BY 1
         ), rc AS (
           SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tb WHERE lang <> 'en' GROUP BY 1
         ), w AS (
           SELECT coalesce(tc.b, rc.b) AS b,
             ((coalesce(ct, 0) + 1) * ${graft.operators.Importance.Scale}) // (coalesce(cr, 0) + 1) AS w
           FROM tc FULL JOIN rc ON tc.b = rc.b
         ), scored AS (
           SELECT doc_id, coalesce(w, ${graft.operators.Importance.Scale}) AS w
           FROM tb LEFT JOIN w USING (b) WHERE lang <> 'en'
         )
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(SUM(w) // COUNT(*) AS BIGINT) AS imp_avg
         FROM scored GROUP BY 1 ORDER BY doc_id""",
    // per-source token budget: running token total in (hash, id) order
    // per source, strict prefix admitted while cum <= budget — the
    // two-phase bucketed prefix sum collapses to this single window
    "q93_token_budget" ->
      s"""WITH t AS (
           SELECT doc_id, source,
             CAST(len(${tokens("text")}) AS BIGINT) AS n_tok,
             ${polyHash("text")} AS h
           FROM documents
         ), c AS (
           SELECT doc_id, source, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           FROM t
         )
         SELECT doc_id, source, n_tok, cum_tok FROM c
         WHERE cum_tok <= 800 ORDER BY doc_id""",
    // KMV: k smallest distinct poly hashes per source; kth = the largest
    // kept; estimate (k-1)*M // kth, short-circuiting to exact below k
    "q68_kmv_distinct" -> {
      val k = 8
      val m = graft.operators.Sketch.M
      s"""WITH d AS (
           SELECT DISTINCT source, ${remix32("h0")} AS h
           FROM (SELECT source, ${polyHash("text")} AS h0 FROM documents) t0
         ), r AS (
           SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS cnt
           FROM d
         ), s AS (
           SELECT source,
             CAST(least(MAX(cnt), $k) AS BIGINT) AS n_kept,
             CAST(MAX(CASE WHEN rn = least(cnt, $k) THEN h END) AS BIGINT) AS kth_hash,
             MAX(cnt) AS cnt
           FROM r GROUP BY 1
         ), e AS (
           SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
           FROM documents GROUP BY 1
         )
         SELECT s.source, n_kept, kth_hash,
           CAST(CASE WHEN cnt < $k THEN cnt
             ELSE ${(k - 1).toLong * m} // greatest(kth_hash, 1) END AS BIGINT) AS est_distinct,
           n_exact
         FROM s JOIN e USING (source) ORDER BY source"""
    },
    // JSONL round-trip digest: identical to reading the source directly
    // iff JSON encode/decode is lossless; shard count is pure arithmetic
    // under the single-writer coalesce
    "q72_jsonl_roundtrip" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         CAST(bit_xor(${polyHash("text")}) AS BIGINT) AS content_xor,
         CAST(ceil(COUNT(*) / 100.0) AS BIGINT) AS n_files
         FROM documents""",
    // KMV overlap: per-side k-minima via row_number, sketch composition,
    // same integer estimate arithmetic as the engine
    "q73_corpus_overlap" -> {
      val k = 64
      val m = graft.operators.Sketch.M
      def est(p: String) =
        s"CASE WHEN ${p}_kept < $k THEN ${p}_kept ELSE ${(k - 1).toLong * m} // greatest(${p}_kth, 1) END"
      s"""WITH ha AS (
           SELECT DISTINCT ${remix32(polyHash("text"))} AS h FROM documents
           WHERE ${polyHash("text")} % 10 < 6
         ), hb AS (
           SELECT DISTINCT ${remix32(polyHash("text"))} AS h FROM documents
           WHERE ${polyHash("text")} % 10 >= 3
         ), ka AS (
           SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha) WHERE rn <= $k
         ), kb AS (
           SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb) WHERE rn <= $k
         ), hu AS (
           SELECT h FROM ha UNION SELECT h FROM hb
         ), ku AS (
           SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hu) WHERE rn <= $k
         ), ust AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS u_kept, MAX(h) AS u_kth FROM ku
         ), ast AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS a_kept, MAX(h) AS a_kth FROM ka
         ), bst AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS b_kept, MAX(h) AS b_kth FROM kb
         ), nb AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM ku
           WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
         )
         SELECT u_kept AS n_kept,
           CAST(${est("a")} AS BIGINT) AS est_a,
           CAST(${est("b")} AS BIGINT) AS est_b,
           CAST(${est("u")} AS BIGINT) AS est_union,
           n_both,
           round(CAST(n_both AS DOUBLE) / CAST(greatest(u_kept, 1) AS DOUBLE), 6) AS jaccard_est,
           CAST((n_both * (${est("u")})) // greatest(u_kept, 1) AS BIGINT) AS est_intersect
         FROM ust, ast, bst, nb"""
    },
    // PII audit: occurrence counts via regexp_extract_all (numbers counted
    // AFTER email redaction, matching the scrub chain's order)
    "q74_pii_report" -> {
      val er = TextFunctions.EmailRegex
      val nr = TextFunctions.LongNumberRegex
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
         CAST(SUM(ne) AS BIGINT) AS n_emails,
         CAST(SUM(CASE WHEN nn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_num,
         CAST(SUM(nn) AS BIGINT) AS n_nums
         FROM (
           SELECT lang, len(regexp_extract_all(text, '$er')) AS ne,
             len(regexp_extract_all(regexp_replace(text, '$er', '<email>', 'g'), '$nr')) AS nn
           FROM documents) t
         GROUP BY 1 ORDER BY 1"""
    },
    // SemDeDup: same trainer CTEs as q37, argmax cell assignment, exact
    // intra-cell cosine pairs at >= 0.4, recursive components, min label
    // r07: gated through the sampled trainer (cells derive from the
    // SAMPLE count — occupancy ~64·every; see Similarity.semDedupSampled)
    "q71_semdedup" -> semDedupOracle(semDedupCellsSql, sampleEvery = 2),
    // same chain, ANN-derived sqrt(n/2) cell count — the engine's blocked
    // pair expansion changes task layout, never the pair set, so the
    // oracle differs from q71 only in the codebook size
    "q85_semdedup_balanced" -> semDedupOracle(annCellsSql),
    "q69_weighted_mix" ->
      s"""SELECT doc_id, lang FROM documents
         WHERE ${polyHash("text")} % 10000 <
           (CASE lang WHEN 'de' THEN 7500 WHEN 'en' THEN 5000 WHEN 'es' THEN 2000
             WHEN 'fr' THEN 10000 ELSE 1000 END)
         ORDER BY doc_id""",
    // segment dedup: the q58 tiling at width 5/overlap 0; global first
    // occurrence per segment hash wins, docs reassembled in segment order
    "q70_segment_dedup" ->
      s"""WITH t AS (
           SELECT doc_id, ${tokens("text")} AS toks FROM documents
         ), segs AS (
           SELECT doc_id, i AS seg_idx,
             array_to_string(toks[i*5+1:i*5+5], ' ') AS seg
           FROM t, unnest(range(0, greatest(CAST(ceil(len(toks) / 5.0) AS INT), 1))) AS u(i)
         ), ranked AS (
           SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY ${polyHash("seg")} ORDER BY doc_id, seg_idx) AS rn
           FROM segs
         )
         SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
         FROM ranked WHERE rn = 1
         GROUP BY doc_id ORDER BY doc_id""",
    // boilerplate removal: every occurrence of a segment present in more
    // than maxDf=2 distinct documents is cut (including the first —
    // unlike q70's keep-first rule); docs rebuilt from survivors
    "q91_boilerplate_segments" ->
      s"""WITH t AS (
           SELECT doc_id, ${tokens("text")} AS toks FROM documents
         ), segs AS (
           SELECT doc_id, i AS seg_idx,
             array_to_string(toks[i*5+1:i*5+5], ' ') AS seg
           FROM t, unnest(range(0, greatest(CAST(ceil(len(toks) / 5.0) AS INT), 1))) AS u(i)
         ), hot AS (
           SELECT ${polyHash("seg")} AS h FROM segs
           GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 2
         ), kept AS (
           SELECT doc_id, seg_idx, seg FROM segs
           WHERE ${polyHash("seg")} NOT IN (SELECT h FROM hot)
         )
         SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
         FROM kept GROUP BY doc_id ORDER BY doc_id""",
    "q56_hash_sample" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
         WHERE ${polyHash("text")} % 100 < 20
         GROUP BY 1 ORDER BY 1""",
    "q57_dedup_against" -> {
      val r = Dedup.RowsPerBand
      s"""WITH sig AS (
           SELECT doc_id, ${minhashSignature("text")} AS sig,
             ${shingleHashesDistinct("text")} AS sh,
             (CASE WHEN ${polyHash("text")} % 100 < 80 THEN 'train' ELSE 'val' END) AS split
           FROM documents
         ), bands AS (
           SELECT doc_id, split, b, array_to_string(sig[b*$r+1:b*$r+$r], '_') AS band_key
           FROM sig, unnest(range(0, ${Dedup.Bands})) AS t(b)
         ), cand AS (
           SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_doc_id
           FROM bands n JOIN bands c ON n.b = c.b AND n.band_key = c.band_key
           WHERE n.split = 'val' AND c.split = 'train'
         ), dup AS (
           SELECT DISTINCT cand.doc_id
           FROM cand JOIN sig a ON cand.doc_id = a.doc_id
                     JOIN sig b2 ON cand.corpus_doc_id = b2.doc_id
           WHERE ${jaccard("a.sh", "b2.sh")} >= 0.8
         )
         SELECT s.doc_id FROM sig s
         WHERE s.split = 'val' AND s.doc_id NOT IN (SELECT doc_id FROM dup)
         ORDER BY s.doc_id"""
    },
    // chunk i covers tokens [i*56+1, i*56+64] (1-based inclusive on both
    // engines: Spark slice(start,len) == DuckDB list[a:b])
    "q58_chunking" ->
      s"""WITH t AS (
           SELECT doc_id, ${tokens("text")} AS toks FROM documents
         ), c AS (
           SELECT doc_id, i AS chunk_idx,
             array_to_string(toks[i*56+1:i*56+64], ' ') AS chunk
           FROM t, unnest(range(0, greatest(CAST(ceil(len(toks) / 56.0) AS INT), 1))) AS u(i)
         )
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
           CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok
         FROM c ORDER BY doc_id, chunk_idx""",
    "q33_hash_split" ->
      s"""SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
           SELECT lang,
             CASE WHEN ${polyHash("text")} % 100 < 80 THEN 'train' ELSE 'val' END AS split
           FROM documents) t
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q34_top_terms" -> {
      val tok = tokens("text")
      s"""WITH tf AS (
           SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT lang, unnest($tok) AS tok FROM documents) t GROUP BY 1, 2
         ), df AS (
           SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS df
           FROM (SELECT lang, unnest(list_distinct($tok)) AS tok FROM documents) t GROUP BY 1, 2
         ), scored AS (
           SELECT tf.lang, tf.tok, tf.tf, df.df,
             CAST(tf.tf * 1000000 // df.df AS BIGINT) AS salience
           FROM tf JOIN df ON tf.lang = df.lang AND tf.tok = df.tok
         ), ranked AS (
           SELECT lang, tok, tf, df, salience,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY salience DESC, tok) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT lang, rnk, tok, salience, tf, df
         FROM ranked WHERE rnk <= 10 ORDER BY lang, rnk"""
    },
    // normalization: the explicit [ \t\n\r] class (regex \s differs
    // between Java and RE2 on vertical tab), collapse -> trim -> NFC;
    // DuckDB's nfc_normalize is the same Unicode NFC the kernel applies
    "q87_normalize" ->
      s"""SELECT doc_id,
           nfc_normalize(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))) AS text,
           (nfc_normalize(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))) <> text) AS changed
         FROM documents ORDER BY doc_id""",
    // Gopher structural heuristics: the four integer metric formulas and
    // the keep conjunction, mirrored from the shared fragments (all
    // non-negative integer arithmetic — zero rounding risk)
    "q88_doc_heuristics" ->
      s"""SELECT doc_id,
           CAST(${gopherNWords("text")} AS BIGINT) AS n_words,
           CAST(${gopherMeanLenMilli("text")} AS BIGINT) AS mean_len_milli,
           CAST(${gopherAlphaPermille("text")} AS BIGINT) AS alpha_permille,
           CAST(${gopherStopDistinct("text")} AS BIGINT) AS stop_distinct,
           ${gopherKeepPredicate("text")} AS keep
         FROM documents ORDER BY doc_id""",
    // shard plan: content-hash shard + within-shard rank of the same
    // hash (id tie-break) — both engines hash the identical "id:seed"
    // string, so the materialized order is bit-identical
    // the manifest replay: q89's plan chain + per-row digests + the
    // nShards-row aggregate (bit_xor is order-free in both engines)
    // percentile replay: the q22 quality formula, micro-quantized, then
    // per-source percent_rank over distinct values
    "q144_quality_pct" ->
      s"""$qualityPctCtes
         SELECT doc_id, source, score_micro, pct_micro
         FROM pct ORDER BY doc_id""",
    // the calibrated filter is the same chain + one threshold, ranked
    // FROM ABOVE (ADVICE r10: strictly-greater count under the keep
    // budget — a uniform-score source keeps everything instead of being
    // silently wiped out by pct_micro = 0)
    "q145_keep_top_quality" ->
      s"""$qualityPctCtes
         SELECT doc_id, source, score_micro, pct_micro
         FROM pct WHERE (n - n_le) * 1000 < 300 * n ORDER BY doc_id""",
    // the duplication-matrix replay: distinct (prefix-hash, source),
    // per-hash self-pairing, totals joined back for containment milli
    "q143_source_overlap" -> {
      val key = "array_to_string((string_split(text, ' '))[1:4], ' ')"
      s"""WITH hs AS (
           SELECT DISTINCT ${polyHash(key)} AS h, source FROM documents
         ), totals AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM hs GROUP BY 1
         ), pairs AS (
           SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
           FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2
         )
         SELECT src_a, src_b, n_shared, ta.n AS n_a, tb.n AS n_b,
           n_shared * 1000 // ta.n AS contain_a_milli,
           n_shared * 1000 // tb.n AS contain_b_milli
         FROM pairs
         JOIN totals ta ON ta.source = src_a
         JOIN totals tb ON tb.source = src_b
         ORDER BY src_a, src_b"""
    },
    "q141_tfidf_indexed" -> tfidfOracle,
    "q142_bm25_batch" -> bm25BatchOracle,
    "q140_manifest" -> {
      val rowKey = s"(CAST(doc_id AS VARCHAR) || ':' || CAST(${polyHash("text")} AS VARCHAR))"
      s"""WITH h0 AS (
           SELECT doc_id, text,
             ${polyHash("(CAST(doc_id AS VARCHAR) || ':42')")} AS h0
           FROM documents
         ), plan AS (
           SELECT doc_id, text, ${remix32("h0")} AS h FROM h0
         ), pos AS (
           SELECT doc_id, text, CAST(h % 8 AS BIGINT) AS shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT)
               AS position
           FROM plan
         ), digests AS (
           SELECT shard, position,
             CAST(len(${tokens("text")}) AS BIGINT) AS n_tok,
             CAST(length(text) AS BIGINT) AS n_chars,
             ${polyHash(rowKey)} AS ch0,
             ${polyHash(s"(CAST(position AS VARCHAR) || ':' || $rowKey)")} AS och0
           FROM pos
         ), hashed AS (
           SELECT shard, n_tok, n_chars, position,
             ${remix32("ch0")} AS ch, ${remix32("och0")} AS och
           FROM digests
         )
         SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(position) AS max_position,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           bit_xor(ch) AS content_xor, bit_xor(och) AS order_xor
         FROM hashed GROUP BY shard ORDER BY shard"""
    },
    "q89_shuffle_plan" ->
      s"""WITH h0 AS (
           SELECT doc_id,
             ${polyHash("(CAST(doc_id AS VARCHAR) || ':42')")} AS h0
           FROM documents
         ), h AS (
           SELECT doc_id, ${remix32("h0")} AS h FROM h0
         )
         SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS position
         FROM h ORDER BY shard, position""",
    // curriculum plan: q89's remixed shard hash, position ranked by
    // (token count, id) within the shard
    "q98_curriculum_plan" ->
      s"""WITH h0 AS (
           SELECT doc_id,
             CAST(len(${tokens("text")}) AS BIGINT) AS s,
             ${polyHash("(CAST(doc_id AS VARCHAR) || ':42')")} AS h0
           FROM documents
         ), h AS (
           SELECT doc_id, s, ${remix32("h0")} AS h FROM h0
         )
         SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY s, doc_id) AS BIGINT) AS position
         FROM h ORDER BY doc_id""",
    // value-histogram quartiles: cumulative over (lang, n_tok) counts,
    // lower-quantile rank test in integer arithmetic
    "q86_token_quantiles" -> {
      val tok = tokens("text")
      s"""WITH t AS (
           SELECT lang, CAST(len($tok) AS BIGINT) AS n_tok FROM documents
         ), h AS (
           SELECT lang, n_tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2
         ), cum AS (
           SELECT lang, n_tok,
             CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_tok) AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n_docs
           FROM h
         )
         SELECT lang, MAX(n_docs) AS n_docs,
           MIN(CASE WHEN cum * 4 >= n_docs THEN n_tok END) AS p25_tok,
           MIN(CASE WHEN cum * 2 >= n_docs THEN n_tok END) AS p50_tok,
           MIN(CASE WHEN cum * 4 >= n_docs * 3 THEN n_tok END) AS p75_tok
         FROM cum GROUP BY 1 ORDER BY 1"""
    },
    "q35_token_median" -> {
      val tok = tokens("text")
      s"""WITH t AS (
           SELECT lang, doc_id, CAST(len($tok) AS BIGINT) AS n_tok FROM documents
         ), ranked AS (
           SELECT lang, n_tok,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS BIGINT) AS rn
           FROM t
         ), stats AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(n_tok) AS BIGINT) AS min_tok, CAST(MAX(n_tok) AS BIGINT) AS max_tok
           FROM t GROUP BY 1
         )
         SELECT s.lang, s.n_docs, s.min_tok, s.max_tok, r.n_tok AS median_tok
         FROM stats s JOIN ranked r
           ON r.lang = s.lang AND r.rn = (s.n_docs + 1) // 2
         ORDER BY s.lang"""
    },
    "q28_embedding_neardup" ->
      s"""SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
         round(${cosine("l.embedding", "r.embedding")}, 6) AS cosine
         FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
         WHERE ${cosine("l.embedding", "r.embedding")} >= 0.4
         ORDER BY vec_a, vec_b""",
    "q30_ann_brute" ->
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosine("q.embedding", "c.embedding")} AS cos
           FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // mirrors Multimodal.decodeFeaturesStub byte-for-byte: the payload is
    // the UTF-8 encoding of `text` and the fixture is pure ASCII, so byte i
    // == unicode(char i); lane j folds bytes j, j+8, ... then (sum % 1000)
    // as REAL / 1000 reproduces the Float arithmetic exactly
    "q41_multimodal_ann" ->
      s"""WITH ch AS (
           SELECT doc_id, list_transform(string_split_regex(text, ''), c -> unicode(c)) AS codes
           FROM documents
         ), feats AS (
           SELECT doc_id AS vec_id,
             list_transform(range(0, 8), j ->
               CAST(coalesce(list_sum(list_transform(
                 list_filter(range(0, len(codes)), i -> i % 8 = j),
                 i -> codes[i+1])), 0) % 1000 AS REAL) / CAST(1000 AS REAL)) AS embedding
           FROM ch
         ), q AS (SELECT vec_id, embedding FROM feats WHERE vec_id IN (0, 1, 2)),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosine("q.embedding", "c.embedding")} AS cos
           FROM q JOIN feats c ON q.vec_id <> c.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",
    // mirrors Kernels.featureHash: token -> lane polyHash % 32, sign from
    // (h // 32) % 2, integer lane sums cast to REAL (exact below 2^24)
    "q43_text_embed_ann" -> {
      val d = 32
      s"""WITH hs AS (
           SELECT doc_id,
             list_transform(${tokens("text")}, tk -> ${polyHash("tk")}) AS hashes
           FROM documents
         ), feats AS (
           SELECT doc_id AS vec_id,
             list_transform(range(0, $d), j ->
               CAST(coalesce(list_sum(list_transform(
                 list_filter(hashes, h -> h % $d = j),
                 h -> CASE WHEN (h // $d) % 2 = 0 THEN 1 ELSE -1 END)), 0) AS REAL)) AS embedding
           FROM hs
         ), q AS (SELECT vec_id, embedding FROM feats WHERE vec_id IN (0, 1, 2)),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosine("q.embedding", "c.embedding")} AS cos
           FROM q JOIN feats c ON q.vec_id <> c.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM scored
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },
    "q31_ann_lsh" -> annLshOracle,
    // LSH served from the persisted bucket artifact == in-plan search
    "q129_ann_lsh_serve" -> annLshOracle,
    // q37 with the trainer running over the 1-in-2 id sample (re-indexed
    // dense so the stride seed sees the structure it assumes); the cell
    // count is the SAMPLE-derived annCells — not compensated, preserving
    // points-per-centroid (see Similarity.annIvfSampled) — and the search
    // stages below the codebook are q37's verbatim
    "q84_ann_ivf_sampled" -> {
      val p = Similarity.IvfProbes
      val sampledCells = annCellsSql
      s"""WITH tsrc AS (
           SELECT vec_id // 2 AS vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 0
         ), ${ivfTrainerCtes(sampledCells, "tsrc")}, scores AS (
           SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
           FROM embeddings e CROSS JOIN $ivfFinalCent ct
         ), ranked_cells AS (
           SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
           FROM scores
         ), assign1 AS (
           SELECT vec_id, cell FROM ranked_cells WHERE r = 1
         ), probes AS (
           SELECT vec_id, cell FROM ranked_cells WHERE r <= $p AND vec_id < 5
         ), cand AS (
           SELECT DISTINCT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
             ${cosine("qe.embedding", "ce.embedding")} AS cos
           FROM probes pr
           JOIN assign1 a ON pr.cell = a.cell AND pr.vec_id <> a.vec_id
           JOIN embeddings qe ON qe.vec_id = pr.vec_id
           JOIN embeddings ce ON ce.vec_id = a.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM cand
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    "q37_ann_ivf" -> annIvfOracle,
    // IVF + int8: q37's trainer/pruning chain verbatim; only the candidate
    // scoring swaps to the integer code cosine over q77's quantization
    "q83_ann_ivf_quantized" -> {
      val p = Similarity.IvfProbes
      def fold(l: String) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), $l), (x, y) -> x + y)"
      def intCos(a: String, b: String): String = {
        val dot = fold(s"list_transform(list_zip($a, $b), pz -> CAST(pz[1] AS BIGINT) * CAST(pz[2] AS BIGINT))")
        val na = fold(s"list_transform($a, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))")
        val nb = fold(s"list_transform($b, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))")
        s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 " +
          s"ELSE CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))) END)"
      }
      s"""WITH ${ivfTrainerCtes(annCellsSql)}, scores AS (
           SELECT e.vec_id, ct.cell, ${cosine("e.embedding", "ct.c_emb")} AS cos
           FROM embeddings e CROSS JOIN $ivfFinalCent ct
         ), ranked_cells AS (
           SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS r
           FROM scores
         ), assign1 AS (
           SELECT vec_id, cell FROM ranked_cells WHERE r = 1
         ), probes AS (
           SELECT vec_id, cell FROM ranked_cells WHERE r <= $p AND vec_id < 5
         ), qbase AS (
           SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
             embedding
           FROM embeddings
         ), q8 AS (
           SELECT vec_id,
             CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
               ELSE list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT))
             END AS c
           FROM qbase
         ), cand AS (
           SELECT DISTINCT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
             ${intCos("qc.c", "nc.c")} AS cos
           FROM probes pr
           JOIN assign1 a ON pr.cell = a.cell AND pr.vec_id <> a.vec_id
           JOIN q8 qc ON qc.vec_id = pr.vec_id
           JOIN q8 nc ON nc.vec_id = a.vec_id
         ), ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
           FROM cand
         )
         SELECT query_id, rnk, neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    // the dump report is pinned to pure counts over the source table: total
    // rows survive the round-trip, files split at exactly 1000 rows, and
    // limit mode caps at min(limit, |table|) (dump_table.py:94,182,235-248)
    "q50_dump_roundtrip" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         CAST(ceil(COUNT(*) / 1000.0) AS BIGINT) AS n_files,
         CAST(least(1000, COUNT(*)) AS BIGINT) AS max_file_rows,
         CAST(COUNT(*) AS BIGINT) AS source_count
         FROM documents""",
    "q51_dump_limit" ->
      """SELECT CAST(least(123, COUNT(*)) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS source_count
         FROM documents""",
    "q52_dump_partitioned" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",
    // compaction invariants as pure count arithmetic: 50-row fragments
    // from one task -> ceil(n/50) files; compaction to 1000-row targets ->
    // ceil(n/1000) evenly-filled round-robin partitions = files
    "q54_compact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST((COUNT(*) + 49) // 50 AS BIGINT) AS files_before,
         CAST((COUNT(*) + 999) // 1000 AS BIGINT) AS files_after
         FROM documents""",
    "q53_bucketed_join" ->
      """SELECT c.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1 ORDER BY 1""",
    // the salted join must be RESULT-identical to the plain join
    "q55_salted_join" ->
      """SELECT c.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q44_multimodal_resize" ->
      s"""SELECT doc_id,
         CAST(128 AS BIGINT) AS n_bytes,
         ${polyHash("rpad(substring(text, 1, 128), 128, ' ')")} AS checksum
         FROM documents ORDER BY doc_id""",
    "q40_multimodal_meta" ->
      s"""SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         'text/plain' AS mime,
         ${polyHash("text")} AS checksum,
         CAST(floor((CAST(octet_length(encode(text)) AS DOUBLE) - 1.0) / 64.0) AS BIGINT) + 1
           AS n_frames
         FROM documents ORDER BY doc_id"""
  )
}
