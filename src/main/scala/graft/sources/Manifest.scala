package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Append-only ingestion manifest (SURVEY S8/S13): one JSON object per
  * line per ingested file — the bookkeeping role of the reference's
  * `data/raw/manifest.json` (`scripts/download_tlc_range_s3.py:186-196`,
  * `check_manifest.py`). JSON-lines instead of a rewritten array so
  * appends are O(1) and crash-safe; driver-side I/O (this is pipeline
  * metadata, not data). */
object Manifest {

  final case class Entry(url: String, yearMonth: String, cabType: String,
                         downloaded: Boolean, sizeBytes: Long,
                         error: Option[String] = None,
                         rows: Option[Long] = None)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def append(path: String, e: Entry): Unit = {
    val err = e.error.map(x => "\"" + esc(x) + "\"").getOrElse("null")
    val rows = e.rows.map(r => s""","rows":$r""").getOrElse("")
    val line = s"""{"url":"${esc(e.url)}","year_month":"${esc(e.yearMonth)}",""" +
      s""""type":"${esc(e.cabType)}","downloaded":${e.downloaded},""" +
      s""""size_bytes":${e.sizeBytes},"error":$err$rows}""" + "\n"
    Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def read(path: String): Seq[Entry] =
    if (!Files.exists(Paths.get(path))) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(Paths.get(path)).asScala.toSeq.filter(_.nonEmpty).map { l =>
        def field(k: String): Option[String] = {
          val m = ("\"" + k + "\":\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|[^,}]+)").r
            .findFirstMatchIn(l)
          m.map(_.group(1)).map(v =>
            if (v.startsWith("\"")) v.substring(1, v.length - 1)
              .replace("\\\"", "\"").replace("\\\\", "\\")
            else v)
        }
        Entry(
          field("url").getOrElse(""),
          field("year_month").getOrElse(""),
          field("type").getOrElse(""),
          field("downloaded").exists(_ == "true"),
          field("size_bytes").map(_.toLong).getOrElse(0L),
          field("error").filter(_ != "null"),
          field("rows").map(_.toLong))
      }
    }

  /** `check_manifest.py`: count error entries. */
  def errorCount(path: String): Int = read(path).count(_.error.isDefined)
}
