package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{RawDonutBackend, TokenJson, TokenStreamDonutBackend}
import graft.model._

/** token2json semantics vs the public HuggingFace DonutProcessor behavior
  * (reference pipeline/donut_engine.py:64 delegates to it). */
class TokenJsonSpec extends AnyFunSuite {
  private def j(s: String): JValue = TokenJson.token2json(s)

  test("flat fields decode to an ordered dict") {
    assert(j("<s_name>John Doe</s_name><s_dob>1990-01-01</s_dob>") ===
      JObj(Vector("name" -> JStr("John Doe"), "dob" -> JStr("1990-01-01"))))
  }

  test("nested tags recurse; single inner dict unwraps") {
    assert(j("<s_menu><s_item>Coke</s_item><s_price>5</s_price></s_menu>") ===
      JObj(Vector("menu" -> JObj(Vector(
        "item" -> JStr("Coke"), "price" -> JStr("5"))))))
  }

  test("<sep/> after a closing tag yields sibling dicts as a list") {
    assert(j("<s_menu><s_item>A</s_item><sep/><s_item>B</s_item></s_menu>") ===
      JObj(Vector("menu" -> JArr(Vector(
        JObj(Vector("item" -> JStr("A"))),
        JObj(Vector("item" -> JStr("B"))))))))
  }

  test("<sep/> inside a leaf splits list items") {
    assert(j("<s_items>A <sep/> B<sep/>C</s_items>") ===
      JObj(Vector("items" -> JArr(Vector(JStr("A"), JStr("B"), JStr("C"))))))
  }

  test("unclosed tag is dropped, scanning continues") {
    assert(j("<s_a>foo<s_b>bar</s_b>") ===
      JObj(Vector("b" -> JStr("bar"))))
  }

  test("tag-free stream becomes text_sequence") {
    assert(j("plain text") ===
      JObj(Vector("text_sequence" -> JStr("plain text"))))
  }

  test("duplicate keys overwrite in place (dict semantics)") {
    assert(j("<s_k>1</s_k><s_k>2</s_k>") === JObj(Vector("k" -> JStr("2"))))
  }

  test("deep nesting round-trips") {
    val s = "<s_doc><s_header><s_title>T</s_title></s_header>" +
      "<s_body><s_line>l1</s_line><sep/><s_line>l2</s_line></s_body></s_doc>"
    assert(j(s) === JObj(Vector("doc" -> JObj(Vector(
      "header" -> JObj(Vector("title" -> JStr("T"))),
      "body" -> JArr(Vector(
        JObj(Vector("line" -> JStr("l1"))),
        JObj(Vector("line" -> JStr("l2"))))))))))
  }

  test("token-stream backend strips the prompt tag and rejects non-dicts") {
    val backend = new TokenStreamDonutBackend(new RawDonutBackend {
      def generate(ref: String): String =
        if (ref == "ok") "<s_docvqa><s_pan_number>ABCDE1234F</s_pan_number>"
        else "<s_prompt>garbage with no fields"
    })
    assert(backend.process("ok") ===
      JObj(Vector("pan_number" -> JStr("ABCDE1234F"))))
    assert(backend.process("bad") === JObj(Vector.empty))
  }
}
