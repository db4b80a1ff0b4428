package graft.pipe

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant

/** Structured JSON-lines run log — the engine analogue of the reference's
  * centralized JSON logger (`utils/logger.py:7-17`: timestamp/level/logger/
  * message JSON records to `logs/app.log`). Driver-side, append-only, one
  * JSON object per line; stage kernels stay log-free (per-record logging is
  * an anti-pattern at 10^12 rows — per-partition counters flow through the
  * lineage table instead, this file records RUN-level events). */
final class RunLog(path: String) {
  private val p = Paths.get(path)
  Files.createDirectories(p.getParent)

  private def esc(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** Append one event. Values: String | Long | Int | Double | Boolean. */
  def log(level: String, message: String, fields: (String, Any)*): Unit = {
    val body = fields.map { case (k, v) =>
      val jv = v match {
        case s: String => "\"" + esc(s) + "\""
        case other     => other.toString
      }
      "\"" + esc(k) + "\":" + jv
    }
    val line = (Seq(
      "\"timestamp\":\"" + Instant.now().toString + "\"",
      "\"level\":\"" + esc(level) + "\"",
      "\"logger\":\"graft\"",
      "\"message\":\"" + esc(message) + "\"") ++ body)
      .mkString("{", ",", "}\n")
    // single atomic append per event (runs are driver-sequential)
    Files.writeString(p, line, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def info(message: String, fields: (String, Any)*): Unit =
    log("INFO", message, fields: _*)
  def error(message: String, fields: (String, Any)*): Unit =
    log("ERROR", message, fields: _*)
}
