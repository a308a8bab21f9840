package graft.queries

/** Placeholder — filled in by later build batches (SURVEY.md §2). */
object DedupOps extends QueryModule {
  override val all: Seq[QueryDef] = Seq.empty
}
