package graft.sources

/** MQTT topic-filter matching (MQTT 5 spec §4.7): `+` matches exactly
  * one level, `#` (last level only) matches the remaining levels
  * including the parent, `$share/<group>/<filter>` is unwrapped to
  * `<filter>`. Topics starting with `$` are not matched by wildcards
  * at the first level.
  *
  * Pure static function so both the broker and the Catalyst
  * expression (MqttTopicMatches) call the same logic — including from
  * generated code.
  */
object TopicMatcher {

  /** Strip a $share/<group>/ prefix, returning the effective filter. */
  def unshare(filter: String): String =
    if (filter.startsWith("$share/")) {
      val rest = filter.substring("$share/".length)
      val slash = rest.indexOf('/')
      if (slash >= 0) rest.substring(slash + 1) else rest
    } else filter

  def matches(topic: String, rawFilter: String): Boolean = {
    val filter = unshare(rawFilter)
    if (topic == null || filter == null) return false
    // wildcard filters must not match $-topics at the first level
    if (topic.startsWith("$") &&
      (filter.startsWith("+") || filter.startsWith("#"))) return false
    matchLevels(topic.split("/", -1), filter.split("/", -1))
  }

  private def matchLevels(t: Array[String], f: Array[String]): Boolean = {
    var i = 0
    while (i < f.length) {
      val fl = f(i)
      if (fl == "#") return i == f.length - 1
      if (i >= t.length) return false
      if (fl != "+" && fl != t(i)) return false
      i += 1
    }
    t.length == f.length
  }
}
