package graft

import graft.csv.{CsvParseException, QuoteCsv, RawCell}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** RFC-4180 quote-preserving parse/render — unit truth table plus the
  * render∘parse round-trip property (seeded random corpus) mirroring the
  * reference's read/write quoting symmetry
  * (`read.go:183-185` ↔ `write.go:208-209`). */
class QuoteCsvSpec extends AnyFunSuite {

  test("basic split with quoted flags") {
    assert(QuoteCsv.parseRecord("""a,"b",c""") ==
      IndexedSeq(RawCell("a", false), RawCell("b", true), RawCell("c", false)))
  }

  test("embedded quotes, commas, newlines in quoted fields") {
    assert(QuoteCsv.parseRecord("\"a\"\"b\",\"c,d\",\"e\nf\"") ==
      IndexedSeq(RawCell("a\"b", true), RawCell("c,d", true), RawCell("e\nf", true)))
  }

  test("empty cells and trailing comma") {
    assert(QuoteCsv.parseRecord("a,,b,") ==
      IndexedSeq(RawCell("a", false), RawCell("", false), RawCell("b", false), RawCell("", false)))
    assert(QuoteCsv.parseRecord("\"\"") == IndexedSeq(RawCell("", true)))
  }

  test("malformed records throw positional errors") {
    assertThrows[CsvParseException](QuoteCsv.parseRecord("a\"b"))       // bare quote
    assertThrows[CsvParseException](QuoteCsv.parseRecord("\"unterminated"))
    assertThrows[CsvParseException](QuoteCsv.parseRecord("\"a\"x,b"))   // garbage after close
  }

  test("splitRecords respects newlines inside quotes, LF and CRLF") {
    assert(QuoteCsv.splitRecords("a,b\r\nc,\"d\ne\"\nf") ==
      IndexedSeq("a,b", "c,\"d\ne\"", "f"))
  }

  test("render quotes iff quoted-bit or content-forced") {
    assert(QuoteCsv.renderRecord(Seq(
      RawCell("x", false), RawCell("x", true), RawCell("a,b", false), RawCell("q\"t", false))) ==
      "x,\"x\",\"a,b\",\"q\"\"t\"")
  }

  private val hostileChars = "abcXYZ019,\"\n .".toCharArray

  private def randomCell(rnd: Random): RawCell = {
    val n = rnd.nextInt(12)
    val s = Array.fill(n)(hostileChars(rnd.nextInt(hostileChars.length))).mkString
    RawCell(s, rnd.nextBoolean())
  }

  test("property: parse(render(cells)) preserves values; quoted-bit never drops") {
    val rnd = new Random(42)
    for (_ <- 1 to 2000) {
      val cells = IndexedSeq.fill(1 + rnd.nextInt(8))(randomCell(rnd))
      val rendered = QuoteCsv.renderRecord(cells)
      val back = QuoteCsv.parseRecord(rendered)
      assert(back.map(_.value) == cells.map(_.value), s"rendered=<$rendered>")
      // quoting may be content-forced, so quoted-bit only grows, never drops
      back.zip(cells).foreach { case (b, orig) =>
        if (orig.quoted) assert(b.quoted)
      }
    }
  }

  test("property: splitRecords(joined) == records (random rendered corpus)") {
    val rnd = new Random(7)
    for (_ <- 1 to 500) {
      val recs0 = List.fill(1 + rnd.nextInt(6))(
        QuoteCsv.renderRecord(IndexedSeq.fill(1 + rnd.nextInt(5))(randomCell(rnd))))
      // a trailing empty record is indistinguishable from a terminating
      // newline (inherent CSV ambiguity) — pin the tail to non-empty
      val recs = if (recs0.last.isEmpty) recs0 :+ "end" else recs0
      assert(QuoteCsv.splitRecords(recs.mkString("\n")) == recs.toIndexedSeq)
    }
  }
}
