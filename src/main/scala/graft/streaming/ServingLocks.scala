package graft.streaming

/** Construction-time enforcement of the SERIALIZED-ROLL contract shared
  * by [[IngestServing.startIngestStream]] and
  * [[RetentionServing.startRetentionStream]]: every foreachBatch body
  * locks on the `dedupRef` INSTANCE, so two streams rolling the same
  * standing state (the ANN operating point in `annOpRef`, the embedding
  * catalog in `embRef`) serialize only if they were constructed with
  * the same `dedupRef`. The comment used to be the only guard — a
  * caller sharing an `embRef` across two streams with distinct
  * `dedupRef`s would race on that ref's get()/set() (a lost roll
  * silently resurrects removed vectors in the served generation).
  *
  * [[register]] pins each auxiliary standing ref to the dedupRef it is
  * FIRST constructed with and rejects any later stream that pairs it
  * with a different lock identity — the misconfiguration fails at
  * construction instead of corrupting state under concurrency. Keys are
  * weak: a ref that is no longer reachable (torn-down test fixtures,
  * retired serving state) drops out of the registry, so re-using a
  * fresh ref object never trips over a dead registration. */
private[graft] object ServingLocks {
  private val owners =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, AnyRef]())

  /** Pin `aux` standing refs to `dedupRef` (the roll-lock identity);
    * throws if any of them is already pinned to a DIFFERENT dedupRef. */
  def register(dedupRef: AnyRef, aux: AnyRef*): Unit = aux.foreach { a =>
    owners.synchronized {
      val prev = owners.putIfAbsent(a, dedupRef)
      require(prev == null || (prev eq dedupRef),
        "standing-state refs shared across streams must be constructed " +
          "with the SAME dedupRef instance — it is the serialized-roll " +
          "lock identity; a second stream pairing this ref with a " +
          "different dedupRef would race its get()/set()")
    }
  }
}
