package graft.queries

import graft.SparkSpec

/** `d_pii_redact` semantics the corpus oracle cannot show (the synthetic
  * corpus contains no PII, so the driver row only checks the no-op
  * identity): each class detects and scrubs its patterns, and the fixed
  * class order resolves overlaps (ssn before phone).
  */
class PiiSpec extends SparkSpec {

  test("corpus is PII-free: zero counts on every document") {
    val out = Text.queries("d_pii_redact")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Text.PiiPatterns.indices.forall(i => r.getInt(1 + i) == 0),
        s"doc ${r.getLong(0)} matched a PII pattern")
    }
  }

  test("injected PII is counted per class and scrubbed in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+spam@example.co.uk for details"),
      (2L, "ssn 123-45-6789 then call +1 (415) 555-0123 ok"),
      (3L, "server at 10.0.0.1 and 192.168.1.255 replied"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val rows = TextTestAccess.piiRedact(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getString(5)))
      .toMap
    assert(rows(1L) == (((1, 0, 0, 0), "contact <EMAIL> for details")))
    // the ssn is claimed by the SSN class, NOT double-counted by phone.
    assert(rows(2L) == (((0, 1, 1, 0), "ssn <SSN> then call <PHONE> ok")))
    assert(rows(3L) == (((0, 0, 0, 2), "server at <IP> and <IP> replied")))
    assert(rows(4L) == (((0, 0, 0, 0), "nothing sensitive here at all")))
  }
}

/** Test access to the package-private redaction body. */
object TextTestAccess {
  def piiRedact(docs: org.apache.spark.sql.DataFrame) = Text.piiRedact(docs)
}
