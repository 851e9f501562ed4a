package graft

import graft.operators.Deidentify
import org.apache.spark.sql.functions._

/** Generative law for the netstring cell-key encoding the whole privacy
  * tier hashes (noise streams, domain digests): distinct quasi tuples
  * MUST produce distinct keys — a collision means two different cells
  * share one noise draw, the correlated-noise leak class of VERDICT r13
  * №1 (separator collision) and the r14 ADVICE residue (NULL vs the ␀
  * sentinel). The generator is adversarial by construction: parts are
  * built FROM the encoding's own meta-characters — the '|' join
  * separator, the ':' length separator, digits (the length-prefix
  * space), the old ␀ sentinel, the bare-`n` NULL tag itself, the empty
  * string, NULL, and a multibyte char (length must count CHARACTERS in
  * both engines).
  */
class CellKeySpec extends SparkSpec {
  import spark.implicits._

  // driver-side replay of the documented encoding (also what the DuckDB
  // fragment mirrors — the 187-gate oracle run pins that side)
  private def replay(parts: Seq[Option[String]]): String =
    parts.map {
      case None => "n"
      case Some(v) => s"${v.length}:$v"
    }.mkString("|")

  private val alphabet = Array("|", ":", "␀", "n", "1", "0", "a", "β")

  private def genPart(rnd: scala.util.Random): Option[String] =
    if (rnd.nextInt(6) == 0) None
    else Some(Seq.fill(rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.length))).mkString)

  test("cell key is injective over adversarial tuples (meta-chars, NULLs, empties) and replays exactly") {
    val rnd = new scala.util.Random(42)
    val tuples = Seq.fill(600)((genPart(rnd), genPart(rnd))).distinct
    // the generator must actually produce the hard cases, or the law is vacuous
    assert(tuples.exists(_._1.isEmpty), "generator covers NULL")
    assert(tuples.exists(_._1.contains("")), "generator covers the empty string")
    assert(tuples.exists(t => t._1.exists(_.contains("|"))), "generator covers the join separator")
    assert(tuples.exists(t => t._1.contains("␀")), "generator covers the old sentinel")
    assert(tuples.exists(t => t._1.contains("n")), "generator covers the NULL tag as a VALUE")

    val rows = tuples.toDF("a", "b")
      .select(col("a"), col("b"), Deidentify.cellKey(Seq("a", "b")).as("k"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getString(2))
    // engine == driver replay, bit for bit, on every tuple
    rows.foreach { case (t, k) =>
      assert(k === replay(Seq(t._1, t._2)), s"replay mismatch for $t")
    }
    // injectivity: |distinct keys| == |distinct tuples|
    assert(rows.map(_._2).distinct.length === tuples.length,
      "distinct quasi tuples must map to distinct cell keys — a collision shares a noise draw")
  }

  test("NULL's key space is disjoint from EVERY string value's") {
    // every string — including '', 'n', '␀', and strings of digits —
    // encodes digit-first; NULL encodes as the bare tag: no overlap
    val rnd = new scala.util.Random(7)
    val values = (Seq("", "n", "␀", "0", "1:", "n|n") ++
      Seq.fill(200)(genPart(rnd)).flatten).distinct
    val keys = values.toDF("a")
      .select(Deidentify.cellKey(Seq("a")).as("k"))
      .collect().map(_.getString(0))
    val nullKey = Seq(Option.empty[String]).toDF("a")
      .select(Deidentify.cellKey(Seq("a")).as("k"))
      .head().getString(0)
    assert(nullKey === "n")
    assert(!keys.contains(nullKey), "no string value may collide with the NULL tag")
    assert(keys.forall(_.head.isDigit), "every value encoding is digit-first (length prefix)")
  }

  test("multibyte characters count as ONE character in the length prefix (engine == oracle semantics)") {
    // DuckDB's length() counts characters; Spark's must agree or the
    // noise draw diverges on any non-ASCII quasi value
    val keys = Seq("β", "␀β", "aβc").toDF("a")
      .select(col("a"), Deidentify.cellKey(Seq("a")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys("β") === "1:β")
    assert(keys("␀β") === "2:␀β")
    assert(keys("aβc") === "3:aβc")
  }
}
