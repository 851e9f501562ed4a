package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** De-identification operators for releasing relational extracts — the
  * step the reference's users perform right after the dump it automates
  * (`dump_table.py` extracts OMOP clinical notes; OMOP data leaves the
  * enclave only de-identified). Four standard primitives, each in the
  * engine's deterministic integer discipline so a release replays
  * bit-for-bit:
  *
  *   - [[pseudonymize]] — salted-hash key replacement, referentially
  *     consistent ACROSS tables (same domain+value+salt → same pseudonym
  *     everywhere, so joins still work on the released data; rotating the
  *     salt retires an entire release's mapping at once).
  *   - [[dateShift]] — the HIPAA Safe-Harbor-adjacent per-entity date
  *     shift: every timestamp of one entity moves by the SAME
  *     hash-derived offset in ±maxDays, so within-entity intervals (time
  *     between admissions, drug exposure windows) are preserved exactly
  *     while absolute dates are destroyed.
  *   - [[generalize]] — numeric binning to half-open bands (the
  *     generalization-hierarchy step k-anonymity needs before
  *     suppression can succeed on continuous columns).
  *   - [[suppressSmallGroups]] — k-anonymity cell suppression: rows
  *     whose quasi-identifier combination occurs < k times get those
  *     columns nulled (never silently dropped — row counts survive, and
  *     the `suppressed` flag makes the release auditable).
  *   - [[lDiversityAudit]] — the companion report: per quasi-group
  *     distinct-count of a sensitive attribute (k-anonymity without
  *     l-diversity still leaks when a small group is homogeneous).
  *
  * Scale shapes: pseudonymize/dateShift/generalize are pure scan-side
  * projections over builtin arithmetic (zero shuffle, whole-stage
  * codegen, safe at any corpus size). suppressSmallGroups and
  * lDiversityAudit shuffle ONCE on the quasi-identifier key with
  * map-side partial aggregation absorbing hot cells; the suppress
  * join-back reuses the same key, so AQE plans it against the
  * aggregate's partitioning.
  *
  * Collision honesty: pseudonyms are remix32∘polyHash values (< 2^32),
  * so two distinct source keys collide with birthday probability
  * ≈ n²/2^33 — at 10M patients that is a ~1% chance of ONE colliding
  * pair. That is the standard trade of stateless hash pseudonymization
  * (an exact bijection needs a stateful mapping table — a shuffle and a
  * durable secret store); callers who need zero collisions should dump
  * the distinct pseudonym count next to the distinct key count
  * ([[QualityChecks]] profile) and rotate the salt on a hit.
  */
object Deidentify {

  /** The pseudonym column expression: remix32(polyHash(domain:value:salt)).
    * `domain` names the identifier SPACE ("person", "visit"...) so equal
    * integers from unrelated key spaces do not pseudonymize equally;
    * tables sharing a foreign key use the same domain and stay joinable.
    * remix32 is required: polyHash alone is monotone in short inputs
    * (see [[GraftExpressions.remix32]]), which would leak key ORDER —
    * for a sequential patient id that is an enrollment-date leak.
    */
  def pseudonymExpr(domain: String, value: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    GraftExpressions.remix32(
      GraftExpressions.poly_hash(
        concat(lit(domain), lit(":"), value.cast("string"), lit(":"), lit(salt))
      )
    )

  /** Replace each listed key column with its pseudonym, in place (same
    * column name, LongType). `keys` maps column name → domain.
    */
  def pseudonymize(df: DataFrame, keys: Map[String, String], salt: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val missing = keys.keySet -- df.columns.toSet
    require(missing.isEmpty, s"missing key columns: ${missing.mkString(", ")}")
    keys.foldLeft(df) { case (d, (c, domain)) =>
      d.withColumn(c, pseudonymExpr(domain, col(c), salt))
    }
  }

  /** Shift `tsCol` by a per-`entityCol` constant offset in [−maxDays,
    * +maxDays], derived from hash(domain:entity:salt) — all rows of one
    * entity (across EVERY table shifted with the same domain+salt) move
    * together, so within-entity intervals are exact. Adds nothing but
    * the rewritten timestamp column.
    *
    * Day arithmetic is `timestampadd(DAY, …)` under the engine's pinned
    * UTC session timezone — a calendar day is exactly 86400 s, so the
    * oracle's `ts + off * INTERVAL 1 DAY` replays it bit-for-bit.
    */
  def dateShift(
      df: DataFrame,
      tsCol: String,
      entityCol: String,
      maxDays: Int,
      salt: String,
      domain: String = "dateshift"
  ): DataFrame = {
    require(maxDays > 0, s"need maxDays > 0, got $maxDays")
    val span = 2L * maxDays + 1L
    val off = (pseudonymExpr(domain, col(entityCol), salt) % span - maxDays).cast("int")
    df.withColumn("__graft_off", off)
      .withColumn(tsCol, expr(s"timestampadd(DAY, __graft_off, $tsCol)"))
      .drop("__graft_off")
  }

  /** Bin a numeric column into half-open bands `[lo, lo+width)` labelled
    * `"[lo,hi)"` — floor semantics, so negatives band correctly
    * (−0.5 with width 1000 lands in `[-1000,0)`, not `[0,1000)`).
    * Returns the frame with an added `outCol` string column.
    */
  def generalize(df: DataFrame, numCol: String, width: Long, outCol: String): DataFrame = {
    require(width > 0, s"need width > 0, got $width")
    val lo = (floor(col(numCol) / width.toDouble) * width).cast("long")
    df.withColumn(outCol, concat(lit("["), lo.cast("string"), lit(","), (lo + width).cast("string"), lit(")")))
  }

  /** k-anonymity cell suppression: count each quasi-identifier
    * combination (NULL-safe — all-null is itself a cell) and NULL every
    * quasi column on rows whose cell has < k members, flagging them
    * `suppressed`. Rows are never dropped. One shuffle on the quasi key;
    * the join back is on the same key (co-partitioned with the
    * aggregate), and a skewed hot cell is absorbed by partial aggregates
    * on the count side and AQE skew-split on the join side.
    */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"need k >= 1, got $k")
    val counts = quasiCols
      .foldLeft(df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__graft_cell_n"))) {
        (d, c) => d.withColumnRenamed(c, s"__graft_q_$c")
      }
    // null-safe equality: an all-NULL quasi combination is itself a cell
    // (the aggregate groups NULLs together; a plain equi-join would
    // orphan those rows into a NULL count)
    val cond = quasiCols.map(c => df(c) <=> counts(s"__graft_q_$c")).reduce(_ && _)
    val joined = df.join(counts, cond, "left").drop(quasiCols.map(c => s"__graft_q_$c"): _*)
    val small = col("__graft_cell_n") < k
    val suppressed = quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(small, lit(null).cast(df.schema(c).dataType)).otherwise(col(c)))
    }
    suppressed.withColumn("suppressed", small).drop("__graft_cell_n")
  }

  /** l-diversity audit: per quasi-identifier cell, the row count and the
    * distinct count of `sensitiveCol`, with `ok = n_distinct >= l`
    * (cells smaller than l rows can never pass — the report shows the
    * k-anonymity/l-diversity interaction directly). One aggregate.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"need l >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("cell_n"),
        countDistinct(col(sensitiveCol)).as("n_distinct"),
        (countDistinct(col(sensitiveCol)) >= l).as("ok")
      )
  }
}
