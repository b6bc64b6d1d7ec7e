package graft

/** Helpers shared by every oracle-SQL surface (ExtensionQueries,
  * ServingQueries) — one home for the rules that were drifting as
  * per-file copies (round-8 review finding).
  */
object OracleSqlUtil {

  /** A double as a DuckDB DOUBLE literal: string-cast form, so the parse
    * is the correctly-rounded round-trip of Double.toString (a bare
    * decimal literal would go through DuckDB's DECIMAL type instead).
    */
  def dlit(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** The cached fitted state, iff unambiguous — exactly one sf dir
    * fitted this JVM. Verify forks one JVM per sf dir and runs queries
    * BEFORE dumping oracles, so the map holds exactly one entry when an
    * oracle renders; zero or several entries mean the oracle must be
    * omitted (the driver then records a weaker rows-only check instead
    * of a wrong compare).
    */
  def cachedOne[T](m: java.util.concurrent.ConcurrentHashMap[String, T]): Option[T] = {
    val vs = m.values()
    if (vs.size == 1) Some(vs.iterator().next()) else None
  }
}
