package graft.ext

import org.apache.spark.sql.DataFrame

import graft.sources.TxLogTable

/** Transactionally-refreshed materialized view: a COUNT/SUM aggregate
  * of one [[TxLogTable]] maintained inside another, with the
  * last-folded source version riding as a COMMIT MARKER on the view
  * table — state and watermark travel in one atomic manifest, so a
  * refresh is exactly-once by construction: a crash before the commit
  * leaves the old marker (the rerun folds the same range again onto
  * the same old state), a crash after leaves both advanced. This is
  * the table-backed twin of [[IncrementalView]]'s in-memory fold, and
  * the engine's answer to `REFRESH MATERIALIZED VIEW` with
  * incremental maintenance.
  *
  * Scale shape: each refresh reads the CHANGE dirs of the unfolded
  * range (batch-sized) and the current view state (view-cardinality-
  * sized — aggregate views are orders of magnitude smaller than their
  * source), then overwrites the view. The O(view) rewrite is the
  * simple-and-exact choice; a view too large to rewrite per refresh
  * wants the conditional-merge upgrade (touched groups only, delete
  * arm for n=0) at the cost of the null-group caveat merge keys
  * carry.
  *
  * Concurrent refreshers serialize through the view table's
  * optimistic commit: whichever commits last wins, and its marker
  * matches its state by construction, so the next refresh folds from
  * a consistent watermark regardless of interleaving.
  */
object MaterializedView {

  /** Marker name carrying the last-folded source version. */
  val VersionMarker = "mv_source_version"

  /** Bring `view` up to date with `source`'s current version; returns
    * the source version the view now reflects. First call (no marker)
    * seeds from the source snapshot; later calls fold only
    * `source.changes(lastFolded, head)`. A no-op (already current)
    * commits nothing.
    */
  def refresh(source: TxLogTable, view: TxLogTable,
      groupCols: Seq[String], sumCols: Seq[String]): Long = {
    val head = source.currentVersion
    require(head >= 0, "source table has no committed version")
    view.marker(VersionMarker).map(_.toLong) match {
      case Some(last) if last == head => head
      case Some(last) =>
        require(last < head,
          s"view marker $last is ahead of source head $head")
        val next = IncrementalView.applyChanges(read(view),
          source.changes(last, head), groupCols, sumCols)
        view.overwrite(next, markers = Map(VersionMarker -> head.toString))
        head
      case None =>
        val seeded = IncrementalView.seed(source.readAt(head),
          groupCols, sumCols)
        view.ensureExists(seeded.schema)
        view.overwrite(seeded, markers = Map(VersionMarker -> head.toString))
        head
    }
  }

  /** The view's current state (groupCols, n, sum_<c>). */
  def read(view: TxLogTable): DataFrame = view.read()
}
