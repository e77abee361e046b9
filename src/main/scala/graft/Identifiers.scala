package graft

/** Identifier validation at the API boundary — parity with the reference's
  * CQL-injection guard (`/root/reference/util.go:3-18`): non-empty, only
  * `[0-9A-Za-z_.]`. Spark's analyzer would reject bad identifiers anyway,
  * but the explicit check keeps the error surface identical.
  */
object Identifiers {
  def checkIdentifier(s: String): Boolean =
    s.nonEmpty && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
      (c >= 'a' && c <= 'z') || c == '_' || c == '.')

  /** Throws IllegalArgumentException like the reference aborts the command
    * (`write.go:80-89`, `read.go:63-72`). */
  def requireIdentifier(s: String, what: String): Unit =
    require(checkIdentifier(s), s"invalid $what identifier: '$s'")
}
