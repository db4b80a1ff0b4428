package graft.kernel

import java.util.regex.Pattern
import graft.model._

/** Donut token-stream → structured JSON: the decode step between
  * `model.generate` and the extractor merge (reference
  * `pipeline/donut_engine.py:60-66`, which delegates to the public
  * `DonutProcessor.token2json`). The surrogate backend returns structured
  * dicts directly, so this parser is what lets a REAL Donut checkpoint drop
  * in: its raw `<s_key>value</s_key>` tag stream decodes through
  * `RawDonutBackend`/`TokenStreamDonutBackend` below.
  *
  * Semantics ported 1:1 from the public HuggingFace implementation:
  * - `<s_k>…</s_k>` spans become dict entries (first-match scan, duplicate
  *   keys overwrite in place);
  * - nested start/end tags inside a span recurse (single-element inner
  *   lists unwrap);
  * - `<sep/>` inside a leaf splits list items; after a closing tag it
  *   splits SIBLING dicts (the early-return-list branch);
  * - an unclosed start tag is dropped and scanning continues;
  * - no tags at all → `{"text_sequence": <remaining>}` at top level.
  */
object TokenJson {
  private val startPat = Pattern.compile("<s_(.*?)>", Pattern.CASE_INSENSITIVE)

  /** Top-level decode: a dict, or a list when sibling dicts follow a
    * closing tag (mirrors the reference's possible list return). */
  def token2json(tokens: String): JValue = parse(tokens, isInner = false)

  private def parse(tokens0: String, isInner: Boolean): JValue = {
    var tokens = tokens0
    var output = JObj(Vector.empty)
    var scanning = true
    while (scanning) {
      val m = startPat.matcher(tokens)
      if (!m.find()) scanning = false
      else {
        val key = m.group(1)
        val startTok = m.group()
        val em = Pattern.compile("</s_" + Pattern.quote(key) + ">",
          Pattern.CASE_INSENSITIVE).matcher(tokens)
        if (!em.find()) {
          // unclosed tag: drop it, keep scanning
          tokens = tokens.replace(startTok, "")
        } else {
          val endTok = em.group()
          val cm = Pattern.compile(
            Pattern.quote(startTok) + "(.*?)" + Pattern.quote(endTok),
            Pattern.CASE_INSENSITIVE | Pattern.DOTALL).matcher(tokens)
          if (cm.find()) {
            val content = cm.group(1).trim
            if (content.contains("<s_") && content.contains("</s_")) {
              parse(content, isInner = true) match {
                case JArr(items) if items.nonEmpty =>
                  output = output.updated(key,
                    if (items.length == 1) items(0) else JArr(items))
                case _ => // empty inner value: key skipped
              }
            } else {
              val leaves = content.split(Pattern.quote("<sep/>"), -1)
                .map(l => JStr(l.trim): JValue).toVector
              output = output.updated(key,
                if (leaves.length == 1) leaves(0) else JArr(leaves))
            }
          }
          tokens = tokens.substring(tokens.indexOf(endTok) + endTok.length).trim
          if (tokens.startsWith("<sep/>")) {
            // sibling dicts: return [output] ++ parse(rest)
            val rest = parse(tokens.substring(6), isInner = true) match {
              case JArr(items) => items
              case other       => Vector(other)
            }
            return JArr(output +: rest)
          }
        }
      }
    }
    if (output.fields.nonEmpty) {
      if (isInner) JArr(Vector(output)) else output
    } else {
      if (isInner) JArr(Vector.empty)
      else JObj(Vector("text_sequence" -> JStr(tokens)))
    }
  }
}

/** A model that emits raw Donut token streams (what `model.generate` +
  * `batch_decode` yields after eos/pad strip). */
trait RawDonutBackend extends Serializable {
  def generate(mediaRef: String): String
}

/** DonutBackend over a raw token stream: strips the leading prompt tag
  * (reference donut_engine.py:63 `re.sub(r"<.*?>", "", seq, count=1)`) and
  * decodes with token2json. Non-dict decode results (sibling-list returns,
  * bare text_sequence) collapse to the reference's `{}` failure contract so
  * the extractor merge sees the same shape either way. */
final class TokenStreamDonutBackend(raw: RawDonutBackend) extends DonutBackend {
  private val firstTag = Pattern.compile("<.*?>")
  def process(mediaRef: String): JObj = {
    val seq = raw.generate(mediaRef)
    val stripped = firstTag.matcher(seq).replaceFirst("").trim
    TokenJson.token2json(stripped) match {
      case o: JObj if !o.contains("text_sequence") => o
      case _                                       => JObj(Vector.empty)
    }
  }
}
