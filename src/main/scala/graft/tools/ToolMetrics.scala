package graft.tools

/** The probe tools' one-line JSON artifact writer — shared, because
 * four hand-rolled copies had grown (FreqCardinalityProbe,
 * IterScanAudit, ZipfWindowProbe, ScaleSmoke; r16 review finding) and
 * any serializer fix would have needed applying four times.
 *
 * The format is deliberately the committed artifacts' minimal one:
 * strings quoted verbatim, nested Maps recursed, everything else via
 * toString. Keys and string values in these tools contain no quotes
 * or backslashes by construction (metric names and env-var echoes);
 * a value that DID would produce invalid JSON, so fail loudly rather
 * than silently emitting a corrupt artifact. */
object ToolMetrics {
  def toJson(v: Any): String = v match {
    case m: scala.collection.Map[_, _] => m.map { case (k, x) =>
      quote(k.toString) + ":" + toJson(x) }.mkString("{", ",", "}")
    case s: String => quote(s)
    case b: Boolean => b.toString
    // NaN/Infinity toString is not valid JSON — a degenerate timing
    // division must fail here, not emit a silently corrupt artifact
    // (the same fail-loud contract quote() applies to strings)
    case d: Double =>
      require(java.lang.Double.isFinite(d), s"non-finite metric value: $d")
      d.toString
    case f: Float =>
      require(java.lang.Float.isFinite(f), s"non-finite metric value: $f")
      f.toString
    case n: Number => n.toString
    case other => throw new IllegalArgumentException(
      s"metric value type ${other.getClass.getName} has no JSON form " +
        "this probe writer guarantees")
  }

  private def quote(s: String): String = {
    require(!s.exists(c => c == '"' || c == '\\' || c < ' '),
      s"metric key/value needs JSON escaping the probe writer does not do: '$s'")
    "\"" + s + "\""
  }

  /** Writes `metrics` as one JSON object + newline to `path`. */
  def write(metrics: scala.collection.Map[String, Any], path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toJson(metrics) + "\n")
}
