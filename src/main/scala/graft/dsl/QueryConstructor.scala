package graft.dsl

/** Pluggable strategy turning a raw query STRING into a
  * [[SearchQuery]] — the reference's `QueryConstructor` extension
  * point (impl/queries/QueryConstructor.scala:7-10): an abstract
  * `constructQuery(RawQuery): Query` the user can swap on the index
  * configuration, with a default that builds a boolean query over a
  * hardcoded `"text"` field
  * (impl/queries/DefaultQueryConstructor.scala:10-17).
  *
  * Set on [[graft.search.IndexSpec.queryConstructor]]; the index's
  * raw-STRING APIs ([[graft.search.SearchIndex.searchRaw]] and the
  * string-batch `batchSearchRaw(Seq[(Long, String)], ...)`) route
  * through it. The structured DSL/term/query-join paths take
  * [[SearchQuery]] values directly and are deliberately outside the
  * strategy (the caller already constructed the query). Serializable
  * so a constructor can ride executor-side closures (query-join
  * generators). */
trait QueryConstructor extends Serializable {
  def construct(raw: String): SearchQuery

  /** One-line description for [[graft.search.SearchIndex.getConfigInfo]]. */
  def describe: String = toString
}

/** Default strategy: the [[Parsed]] mini-grammar over ONE field —
  * the analog of the reference's DefaultQueryConstructor (Lucene
  * `QueryBuilder.createBooleanQuery` on "text"), except the grammar
  * is the full query syntax (`+required optional -excluded "phrase"
  * field:term wildcards ranges boosts`) rather than bare boolean
  * text. */
final case class DefaultQueryConstructor(field: String = "text")
    extends QueryConstructor {
  def construct(raw: String): SearchQuery = Parsed(field, raw)
}

/** Multi-field "best fields" strategy: parse the string once per
  * field and combine with [[DisMax]] over per-field boosts — the
  * Elasticsearch `multi_match`/`best_fields` shape, the canonical
  * non-default constructor a production search deployment swaps in
  * (title^2 + body). A boost of 1.0 skips the [[Boost]] wrapper so
  * the single-field, weight-1 case degenerates to the default
  * constructor exactly. */
final case class MultiFieldQueryConstructor(fields: Seq[(String, Double)],
    tieBreaker: Double = 0.0) extends QueryConstructor {
  require(fields.nonEmpty, "MultiFieldQueryConstructor needs at least one field")
  def construct(raw: String): SearchQuery = {
    val clauses = fields.map { case (f, w) =>
      if (w == 1.0) Parsed(f, raw): SearchQuery else Boost(Parsed(f, raw), w)
    }
    if (clauses.size == 1) clauses.head else DisMax(clauses, tieBreaker)
  }
}
