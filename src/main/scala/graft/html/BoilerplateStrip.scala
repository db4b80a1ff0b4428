package graft.html

import java.util.regex.Pattern

/** Main-content extraction for `text`-kind spans (HTML boilerplate strip +
  * DOM heuristics) — the north_rule addition on top of the reference's
  * line-veto approach (analogue: `pipeline/cleaner.py:30-31` veto lists).
  *
  * Deterministic, dependency-free: chrome containers (script/style/nav/
  * header/footer/aside) are dropped wholesale, the remaining markup is split
  * into blocks at block-level tag boundaries, each block is scored with a
  * link-density heuristic (≥2 links and short text ⇒ navigation), tags are
  * stripped, entities decoded, and boilerplate-keyword lines vetoed.
  *
  * Hot path: one fused matcher pass handles chrome removal AND block
  * boundaries (two chained replaceAll scans measured ~2× the cost), and
  * entity decoding is a single char scan instead of six chained
  * String.replace passes — equivalence with the chained form is
  * property-tested (BoilerplateStripSpec).
  */
object BoilerplateStrip {
  // one fused pass: comments + chrome containers, OR a block boundary —
  // group 1/2 nonempty ⇒ chrome (→ "\n"), group 3 ⇒ boundary (→ sentinel)
  private val chromeOrBoundaryPat = Pattern.compile(
    "(?is)<!--.*?-->|<(script|style|nav|header|footer|aside|noscript)\\b.*?</\\1\\s*>" +
    "|(?-s:</?(p|div|br|li|ul|ol|h[1-6]|tr|td|table|section|article|blockquote|pre|hr)\\b[^>]*>)")
  private val tagPat = Pattern.compile("<[^>]*>")
  private val linkPat = Pattern.compile("(?i)<a\\b")
  private val wsRunPat = Pattern.compile("\\s+")
  private val boilerKeywords = Seq(
    "cookie", "subscribe", "copyright", "©", "all rights reserved",
    "privacy policy", "terms of service", "sign up", "log in", "newsletter")

  private val entities: Array[(String, Char)] = Array(
    "&nbsp;" -> ' ', "&lt;" -> '<', "&gt;" -> '>',
    "&quot;" -> '"', "&#39;" -> '\'', "&amp;" -> '&')

  /** Single-scan entity decode, same fixed precedence as the chained
    * String.replace form (decoded output is never rescanned, matching the
    * pass-per-entity semantics where only `&amp;` — last — emits a '&'). */
  private def decodeEntities(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        var matched = -1
        var e = 0
        while (matched < 0 && e < entities.length) {
          if (s.regionMatches(i, entities(e)._1, 0, entities(e)._1.length))
            matched = e
          else e += 1
        }
        if (matched >= 0) {
          sb.append(entities(matched)._2)
          i += entities(matched)._1.length
        } else {
          sb.append(c); i += 1
        }
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private val BlockSep = "\u0000BLOCK\u0000"

  /** HTML → main-content lines. Plain text (no tags) passes through as
    * trimmed nonempty lines. */
  def lines(html: String): Vector[String] = {
    if (html == null || html.isEmpty) return Vector.empty
    // fused chrome-strip + block-boundary pass (one scan, one allocation)
    val m = chromeOrBoundaryPat.matcher(html)
    val sb = new java.lang.StringBuilder(html.length)
    while (m.find()) {
      m.appendReplacement(sb,
        if (m.start(2) >= 0) "\n\u0000BLOCK\u0000\n" else "\n")
    }
    m.appendTail(sb)
    val s = sb.toString

    val blocks = s.split(BlockSep)
    val out = Vector.newBuilder[String]
    for (block <- blocks) {
      val linkCount = {
        val lm = linkPat.matcher(block)
        var c = 0
        while (lm.find()) c += 1
        c
      }
      val noTags =
        if (block.indexOf('<') < 0) block
        else tagPat.matcher(block).replaceAll(" ")
      val text = decodeEntities(noTags)
      for (rawLine <- text.split('\n')) {
        val line = wsRunPat.matcher(rawLine).replaceAll(" ").trim
        if (line.nonEmpty) {
          // DOM heuristic: link-dense short blocks are navigation chrome
          val navLike = linkCount >= 2 && line.length < 80
          val lower = line.toLowerCase
          val boiler = boilerKeywords.exists(lower.contains)
          if (!navLike && !boiler) out += line
        }
      }
    }
    out.result()
  }
}
