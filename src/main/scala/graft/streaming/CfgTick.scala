package graft.streaming

/** Per-transform self-documentation (ref s/DocumentingTransform.java):
  * a configured transform renders a human-readable description of
  * exactly what it alerts on, derived from its live configuration —
  * the reference embeds these in the config-tick heartbeat so
  * operators can read, from the stream itself, what the pipeline was
  * doing at any point in time. */
trait DocumentingTransform {
  /** Class-style name used as the `heuristic_<name>` payload key. */
  def docName: String

  /** Configuration-derived documentation string. */
  def transformDoc: String
}

/** Config-tick payload assembly (ref s/metrics/CfgTickBuilder.java:
  * 40-70): one `heuristic_<Name>` entry per enabled transform plus
  * `configuration_tick: "true"` and any caller-supplied option
  * key/values, rendered as a flat JSON string map. The reference
  * serializes an unordered HashMap; here keys are SORTED so the
  * payload is byte-stable and goldenable. */
object CfgTickBuilder {

  def doc(name: String, text: String): DocumentingTransform =
    new DocumentingTransform {
      val docName: String = name
      val transformDoc: String = text
    }

  def build(transforms: Seq[DocumentingTransform],
      options: Map[String, String] = Map.empty): String = {
    val data = options ++
      transforms.map(t => s"heuristic_${t.docName}" -> t.transformDoc) +
      ("configuration_tick" -> "true")
    data.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
