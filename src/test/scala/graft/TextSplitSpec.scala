package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextSplit

/** Splitter semantics per the reference config chroma_utils.py:16-21:
  * chunk_size / chunk_overlap / separator preference ["\n\n","\n"," ",""].
  * Property cases are generated with seeded ScalaCheck Gens (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class TextSplitSpec extends AnyFunSuite {

  test("text shorter than chunkSize is one unchanged chunk") {
    assert(TextSplit.splitText("hello world", 1000, 200) == Vector("hello world"))
  }

  test("empty text gives zero chunks") {
    assert(TextSplit.splitText("", 1000, 200).isEmpty)
  }

  test("paragraphs split on double newline first") {
    val text = "para one is here\n\npara two is here\n\npara three"
    val chunks = TextSplit.splitText(text, 20, 5)
    assert(chunks.contains("para one is here"))
    assert(chunks.contains("para two is here"))
    assert(chunks.contains("para three"))
  }

  test("long paragraph falls back to single newline, then spaces") {
    val text = ("word " * 50).trim + "\n" + ("tail " * 10).trim
    val chunks = TextSplit.splitText(text, 40, 10)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 40))
  }

  test("unsplittable run falls back to hard character split WITH overlap") {
    val text = (0 until 2500).map(i => ('a' + i % 26).toChar).mkString
    val chunks = TextSplit.splitText(text, 1000, 200)
    // windows advance by chunkSize - overlap = 800: [0,1000), [800,1800), [1600,2500)
    assert(chunks.map(_.length) == Vector(1000, 1000, 900))
    assert(chunks(0).takeRight(200) == chunks(1).take(200)) // 200-char carry-over
    assert(chunks(1).takeRight(200) == chunks(2).take(200))
    assert(chunks(2).last == text.last)
  }

  test("hard split drops a trailing window inside the previous overlap") {
    // len=250, size=100, overlap=20 -> starts 0,80,160 (240 is within the
    // previous chunk's overlap region and must not produce a 4th chunk)
    val text = "y" * 250
    val chunks = TextSplit.splitText(text, 100, 20)
    assert(chunks.map(_.length) == Vector(100, 100, 90))
  }

  test("adjacent chunks share overlap content") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = TextSplit.splitText(words, 100, 40)
    assert(chunks.size > 1)
    chunks.sliding(2).foreach {
      case Vector(a, b) =>
        val shared = a.split(" ").toSet.intersect(b.split(" ").toSet)
        assert(shared.nonEmpty, s"no overlap between [$a] and [$b]")
      case _ =>
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    parts <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumStr.map(_.take(12)),
      2 -> Gen.oneOf(" ", "\n", "\n\n")))
  } yield parts.mkString(" ")

  private def samples(count: Int): Seq[String] =
    (1 to count).map(i => textGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: every chunk is within chunkSize") {
    samples(200).foreach { text =>
      TextSplit.splitText(text, 50, 10).foreach(c =>
        assert(c.length <= 50, s"oversized chunk for input [$text]"))
    }
  }

  test("property: every word of the input appears in some chunk") {
    samples(200).foreach { text =>
      val joined = TextSplit.splitText(text, 50, 10).mkString(" ")
      text.split("\\s+").filter(w => w.nonEmpty && w.length <= 50).foreach { w =>
        assert(joined.contains(w), s"missing word [$w] for input [$text]")
      }
    }
  }

  test("property: no chunk is blank and chunks are trimmed") {
    samples(200).foreach { text =>
      TextSplit.splitText(text, 50, 10).foreach { c =>
        assert(c.nonEmpty && c == c.trim)
      }
    }
  }
}
