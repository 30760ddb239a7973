package graft.ops

/** JSONata-engine-backed queries (the reference's core operator surface applied
  * to the testdata). Populated once the jsonata package lands; kept separate so
  * the relational/pipeline registry compiles independently. */
object JsonataQueries {
  val entries: Seq[Q] = Seq()
}
