package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the native [[graft.plans.NfcNormalize]] expression: Unicode
  * NFC composition semantics on real combining sequences, idempotence,
  * the already-normalized identity fast path, NULL propagation, and
  * agreement between codegen and interpreted evaluation. The fixture
  * corpus is ASCII, so the Unicode behavior MUST be pinned here — the
  * oracle-certified query (`x11r_unicode_canon`) manufactures its
  * decomposed carrier from the fixture and this spec proves the
  * primitive it rides on. */
class NfcNormalizeSpec extends SparkSuite {

  import graft.plans.NfcNormalize

  private val composed = "café"            // é U+00E9
  private val decomposed = "café"         // e + COMBINING ACUTE

  test("decomposed combining sequences compose to NFC") {
    assert(NfcNormalize.nfc(UTF8String.fromString(decomposed)).toString
      == composed)
    // multi-mark: a + ring (U+030A) -> å; ASCII tail untouched
    assert(NfcNormalize.nfc(UTF8String.fromString("åbc")).toString
      == "åbc")
  }

  test("already-NFC input returns the SAME buffer (no allocation)") {
    val in = UTF8String.fromString(composed)
    assert(NfcNormalize.nfc(in) eq in)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NfcNormalize.nfc(ascii) eq ascii)
  }

  test("idempotent: nfc(nfc(s)) == nfc(s)") {
    for (s <- Seq(decomposed, composed, "", "Ä́O"))
      assert(NfcNormalize.nfc(NfcNormalize.nfc(
        UTF8String.fromString(s))).toString
        == NfcNormalize.nfc(UTF8String.fromString(s)).toString)
  }

  test("registered function: codegen path, NULL, and column pipeline") {
    import spark.implicits._
    NfcNormalize.register(spark)
    val got = Seq(Some(decomposed), Some(composed), Some(""), None)
      .toDF("s")
      .select(call_function(NfcNormalize.name, col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(composed, composed, "", null))
    // length drop is visible to downstream builtins (the x11r shape)
    val lens = Seq(decomposed).toDF("s")
      .select(length(col("s")).as("raw"),
        length(call_function(NfcNormalize.name, col("s"))).as("canon"))
      .head()
    assert(lens.getInt(0) == 5 && lens.getInt(1) == 4)
  }

  test("x11r query: every row composes and hashes deterministically") {
    val out = graft.operators.TextAnalysis.unicodeCanon(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (marks, canonLen) = (r.getInt(1), r.getInt(2))
      assert(marks > 0, s"doc ${r.getLong(0)} has no injected marks")
      // NFC composes every injected mark away: canon_len = deco - marks
      assert(canonLen >= 1)
      assert(r.getString(3).length == 64) // sha256 hex
    }
  }
}
