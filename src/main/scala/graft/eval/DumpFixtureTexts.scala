package graft.eval

import java.nio.file.{Files, Paths}

import graft.LongMemFixture

/** Dumps the retrieval-quality fixture's (id, content, query) texts as
  * JSON — the input half of the offline real-model vector export
  * (scripts/export_vectors.py). Runs with no Spark session: the
  * fixture is driver-local data.
  *
  * Usage: runMain graft.eval.DumpFixtureTexts [outPath]
  */
object DumpFixtureTexts {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "fixtures/longmem_texts.json"
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val rows = LongMemFixture.records.map { r =>
      s"""{"id":"${esc(r.id)}","content":"${esc(r.content)}","query":"${esc(r.query)}"}"""
    }
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), rows.mkString("[\n", ",\n", "\n]\n"))
    println(s"wrote ${rows.size} fixture texts to $out")
  }
}
