package graft.store

/**
 * The ONE construction-gate ownership rule for the Spark-free reader
 * family (OverlapReader / PhraseReader / SearchReader / AnnReader): a
 * wrapper built under the `new X(KvDomainReader.open(...))` idiom owns
 * the handed-in reader(s) from the first line of its constructor, so
 * ANY gate failure (wrong index family, bad geometry, corrupt meta
 * record) must CLOSE them before the throw — the caller holds no other
 * reference, and a daemon retrying construction against a mid-deploy
 * domain would otherwise leak a shard-handle set per attempt. One
 * definition so the contract cannot drift per reader (the
 * Search.docIdLong rule).
 */
private[store] object ReaderGate {
  /** Run `body` (the constructor's gates + derived fields); on any
    * throw, close every handed-in reader first, then rethrow. */
  def apply[T](readers: AutoCloseable*)(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        readers.foreach(r => try r.close() catch { case _: Exception => () })
        throw e
    }
}
