package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset-checkpointed, RE-ENTRANT dump — the resumability the reference
  * is only "in spirit" about: its cursor loop (`dump_table.py:81-111`)
  * restarts the whole extract from row zero after any failure, and so did
  * this engine's [[OmopDump]] JDBC path. A 100 TB extract WILL be
  * interrupted (maintenance window, executor loss past Spark's retry
  * budget, a DBA killing the session), and restarting a multi-day source
  * read from scratch is the difference between a dump that finishes and
  * one that never does.
  *
  * Design — the source key range IS the checkpoint:
  *
  *   - `[lo, hi]` on `keyCol` (the NOTE_ID-style primary key) splits into
  *     `chunks` contiguous ranges; chunk i dumps
  *     `scan.filter(lo_i <= key < hi_i)` to `outputDir/chunk_i`.
  *   - A chunk directory with the committer's `_SUCCESS` marker is
  *     COMPLETE and is skipped on re-entry — its source rows are never
  *     re-read (the range filter pushes down, so the skipped range never
  *     crosses the wire on JDBC, never leaves the footer on parquet).
  *     A marker-less chunk dir is a crashed attempt and is overwritten
  *     whole — per-chunk idempotence, the same unit-of-retry discipline
  *     as [[graft.streaming.StreamingOps.admitIngest]]'s batches.
  *   - A `_resume.json` manifest pins (keyCol, lo, hi, chunks); re-entry
  *     with DIFFERENT parameters fails fast — resuming under a different
  *     chunking would silently mis-cover the key space.
  *
  * What this does NOT promise, stated honestly: rows inserted into the
  * source between attempts land only if their key falls in a not-yet-
  * complete chunk (the reference has the same count/scan race,
  * SURVEY §3.4 — a dump of a live table is a fuzzy snapshot in both
  * engines); rows with NULL keys are outside every range and are not
  * dumped (the OMOP NOTE_ID contract — primary keys are non-null).
  *
  * Scale shape: each chunk is an independent partitioned scan → write
  * (shuffle-free); `chunks` bounds the blast radius of one failure to
  * `rows/chunks` re-read rows. The driver does one filesystem listing
  * per chunk — metadata-only re-entry cost.
  */
object ResumableDump {

  /** What one invocation did: chunks run now vs. skipped as already
    * complete, plus the read-back report over the WHOLE dump (footers
    * only — the O11 discipline applied to the resumable artifact).
    */
  final case class Result(report: DumpReport, ranChunks: Seq[Int], skippedChunks: Seq[Int])

  def run(
      spark: SparkSession,
      source: NoteSource,
      keyCol: String,
      bounds: (Long, Long),
      outputDir: String,
      chunks: Int,
      layout: ParquetLayout = ParquetLayout()
  ): Result = {
    val (lo, hi) = bounds
    require(chunks >= 1, s"need chunks >= 1, got $chunks")
    require(lo <= hi, s"empty key range [$lo, $hi]")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(outputDir)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)

    // the manifest pins the chunking; a mismatched re-entry fails fast
    val manifest = s"""{"keyCol":"$keyCol","lo":$lo,"hi":$hi,"chunks":$chunks}"""
    val manifestPath = new Path(root, "_resume.json")
    if (fs.exists(manifestPath)) {
      val in = fs.open(manifestPath)
      val prior =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      require(
        prior == manifest,
        s"resume manifest mismatch: dump was started as $prior, asked to resume as $manifest"
      )
    } else {
      val out = fs.create(manifestPath, true)
      try out.write(manifest.getBytes("UTF-8"))
      finally out.close()
    }

    // chunk i covers [lo + i*step, lo + (i+1)*step), last chunk closed at
    // hi inclusive — contiguous, disjoint, covering [lo, hi]
    val span = hi - lo + 1L
    val step = math.max(1L, (span + chunks - 1) / chunks)
    val ran = scala.collection.mutable.ArrayBuffer.empty[Int]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until chunks).foreach { i =>
      val cLo = lo + i * step
      val cHi = math.min(lo + (i + 1) * step - 1, hi)
      val dir = new Path(root, f"chunk_$i%05d")
      if (cLo > hi) {
        // degenerate tail when chunks > span: nothing to cover
        skipped += i
      } else if (fs.exists(new Path(dir, "_SUCCESS"))) {
        skipped += i
      } else {
        val slice = source
          .scan(spark)
          .filter(col(keyCol) >= cLo && col(keyCol) <= cHi)
        ShardedParquetSink.write(slice, dir.toString, layout)
        ran += i
      }
    }

    // read-back over every chunk dir (readBackReport lists one directory
    // non-recursively, so walk the chunk dirs and concatenate)
    val chunkDirs = fs
      .listStatus(root)
      .toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("chunk_"))
      .sortBy(_.getPath.getName)
    require(chunkDirs.nonEmpty, s"no chunk directories under $outputDir")
    val reports = chunkDirs.map(d => ShardedParquetSink.readBackReport(spark, d.getPath.toString))
    val schemas = reports.map(_.schemaDdl).distinct
    require(schemas.size == 1, s"chunk schemas diverge: $schemas")
    Result(DumpReport(schemas.head, reports.flatMap(_.shards)), ran.toSeq, skipped.toSeq)
  }

  /** Open a completed resumable dump as one frame (union of chunk dirs —
    * a plain multi-path parquet scan; no partition-discovery column is
    * introduced because the chunk index is layout, not data).
    */
  def read(spark: SparkSession, outputDir: String): DataFrame = {
    val root = new Path(outputDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs
      .listStatus(root)
      .toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("chunk_"))
      .sortBy(_.getPath.getName)
      .map(_.getPath.toString)
    require(dirs.nonEmpty, s"no chunk directories under $outputDir")
    // skip empty chunk dirs (a range with no rows writes only _SUCCESS)
    val nonEmpty = dirs.filter(d =>
      fs.listStatus(new Path(d)).exists(_.getPath.getName.endsWith(".parquet"))
    )
    if (nonEmpty.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(nonEmpty: _*)
  }
}
