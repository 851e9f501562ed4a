package graft

import graft.operators.OmopDump
import graft.sources.{JdbcNoteSource, JdbcSourceConfig, NoteSource, ParquetLayout, ParquetNoteSource}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Runnable entry point for the parity dump pipeline — the equivalent of
  * `python dump_table.py --output_path DIR` (`dump_table.py:175-180,251-252`).
  *
  * Configuration mirrors the reference's env surface (`readme.md:29-37`):
  *  - `ORACLE_HOST/PORT/SID/USER/PASS` → JDBC source (production path);
  *    otherwise `SPARK_GRAFT_SOURCE` names a parquet file/dir (offline
  *    stand-in, used by tests since no Oracle driver ships here).
  *  - `GRAB_EVERYTHING` (any non-empty value) → dump the whole table with NO
  *    limit — deliberately not "limit to a pre-counted total", which races a
  *    growing table (`dump_table.py:192-197`; SURVEY.md §3.4).
  *  - `GRAFT_LIMIT` → row cap when not grabbing everything (default
  *    2,000,000 = DEFAULT_N_TO_FETCH, `dump_table.py:28`).
  *  - `GRAFT_TABLE` → source table name for JDBC (default NOTE).
  *
  * Progress surfaces through a SparkListener (the tqdm analog,
  * `dump_table.py:209-213`): per-stage task completion logged as it happens.
  */
object DumpMain {

  def main(args: Array[String]): Unit = {
    val outputPath = args.toSeq.sliding(2).collectFirst { case Seq("--output_path", p) => p }
      .getOrElse(sys.error("usage: graft.DumpMain --output_path DIR"))
    // parity with the reference CLI: the output directory must already exist
    // (click.Path(exists=True), dump_table.py:176-179)
    require(new java.io.File(outputPath).isDirectory, s"--output_path $outputPath must be an existing directory")

    val grabEverything = sys.env.get("GRAB_EVERYTHING").exists(_.nonEmpty)
    val limit =
      if (grabEverything) None
      else Some(sys.env.get("GRAFT_LIMIT").map(_.toLong).getOrElse(2000000L))

    val source: NoteSource = JdbcSourceConfig.fromEnv() match {
      case Some(cfg) => new JdbcNoteSource(cfg, sys.env.getOrElse("GRAFT_TABLE", "NOTE"))
      case None =>
        val p = sys.env.getOrElse(
          "SPARK_GRAFT_SOURCE",
          sys.error("configure ORACLE_HOST/SID/USER/PASS or SPARK_GRAFT_SOURCE")
        )
        new ParquetNoteSource(p)
    }

    val spark = GraftSession.local("graft-dump", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        println(s"[dump] stage ${e.stageId}: task ${e.taskInfo.index} done (${e.taskInfo.duration} ms)")
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        println(s"[dump] stage ${e.stageInfo.stageId} complete: ${e.stageInfo.numTasks} tasks")
    })

    val result = OmopDump.run(spark, source, outputPath, limit, ParquetLayout())

    // parity with the reference's read-back report (dump_table.py:235-248):
    // unified schema, per-file footer counts, total.
    println(s"[dump] schema: ${result.report.schemaDdl}")
    result.report.shards.foreach(s => println(s"[dump] ${s.path}: ${s.rows} rows"))
    println(
      s"[dump] total ${result.report.totalRows} rows in ${result.report.numFiles} files " +
        s"(source count ${result.sourceCount}, limit ${limit.fold("ALL")(_.toString)})"
    )
    spark.stop()
  }
}
