package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** The atomic-publish seam of the txlog commit protocol (the LogStore /
  * commit-coordinator idea from the public Delta design): everything
  * the multi-writer story needs from storage is ONE primitive —
  * put-if-absent with exactly one winner — plus a read-repair hook for
  * stores where that primitive is emulated.
  *
  * Two shipping shapes:
  *   - [[PosixCommitOwner]]: POSIX filesystems (local disk, NFS with
  *     proper semantics, HDFS-like). `link(2)` of a fully-written temp
  *     file fails with EEXIST atomically, so the filesystem itself is
  *     the coordinator. This is the default and the only impl the
  *     sandbox exercises against real storage.
  *   - [[ExternalCasCommitOwner]]: object stores (S3/GCS/ABFS-style)
  *     that have NEITHER hard links NOR atomic rename-if-absent. The
  *     winner is decided by an external compare-and-swap registry (in
  *     production: a DynamoDB conditional put, etcd, or a commit
  *     service — the Delta S3 multi-writer answer), and the object
  *     write itself may be arbitrarily non-atomic because only the
  *     CAS winner (or a repairer copying the winner's bytes) ever
  *     writes the destination key.
  */
trait CommitOwner {

  /** Publish `bytes` at `dest` iff nothing is published there yet.
    * MUST be atomic across concurrent callers (any process, any host):
    * exactly one returns true; every other caller of the same `dest`
    * returns false and can rely on the winner's content being (or
    * becoming, via [[recover]]) readable at `dest`.
    */
  def putIfAbsent(dest: Path, bytes: Array[Byte]): Boolean

  /** Read-repair hook: make `dest` readable if a prior winner claimed
    * it but crashed before its object landed. No-op where the
    * filesystem publish is itself atomic.
    */
  def recover(dest: Path): Unit = ()

  /** Last-writer-wins pointer update (the `_last_checkpoint` hint —
    * never correctness-bearing). Atomic swap where the store has one;
    * a plain PUT elsewhere.
    */
  def overwrite(dest: Path, bytes: Array[Byte]): Unit = {
    val tmp = dest.getParent.resolve(s".tmp-ow-${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** POSIX publish: temp-write then `link(2)` into the version slot.
  * The link either creates the name or fails with EEXIST — atomically,
  * unlike `rename(2)` which silently replaces.
  */
object PosixCommitOwner extends CommitOwner {
  override def putIfAbsent(dest: Path, bytes: Array[Byte]): Boolean = {
    val tmp = dest.getParent.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try {
      Files.createLink(dest, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }
}

/** The minimal object-store surface the CAS owner writes through —
  * deliberately WITHOUT any atomic create-if-absent: `put` is a blind
  * last-writer-wins PUT and `exists`/`get` may interleave arbitrarily
  * with concurrent puts. Specs inject adversarial impls (forced
  * interleavings, crash-before-copy) to prove the protocol, not the
  * store, provides the serialization.
  */
trait ObjectStoreOps {
  def exists(p: Path): Boolean
  def put(p: Path, bytes: Array[Byte]): Unit
  def get(p: Path): Array[Byte]

  /** Idempotent delete (S3 DELETE semantics: deleting a missing key
    * succeeds). Used only for temp-object GC — never for published
    * versions.
    */
  def delete(p: Path): Unit
}

/** Pass-through impl over the local filesystem, restricted to the
  * non-atomic surface above — what a real S3 client offers.
  */
object LocalObjectStoreOps extends ObjectStoreOps {
  override def exists(p: Path): Boolean = Files.exists(p)
  override def put(p: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, bytes) // plain overwriting write — no atomicity
  }
  override def get(p: Path): Array[Byte] = Files.readAllBytes(p)
  override def delete(p: Path): Unit = Files.deleteIfExists(p)
}

/** One registry entry: who claimed the key, where the winner's
  * fully-written temp object lives, and whether the copy to the
  * destination key completed. `tmpKey` is what makes crash recovery
  * possible — the bytes are durable BEFORE the claim, so any process
  * can finish an incomplete publish.
  */
final case class ClaimEntry(owner: String, tmpKey: String,
    complete: Boolean)

/** The external atomic compare-and-swap the object-store deployment
  * must provide (DynamoDB conditional put / etcd txn / commit
  * service). Only `claim` needs atomicity; everything else is plain
  * reads/updates of the winner's own entry.
  */
trait CasRegistry {
  /** Record `entry` for `key` iff unclaimed; atomic. Returns None on
    * win, or the pre-existing entry on loss.
    */
  def claim(key: String, entry: ClaimEntry): Option[ClaimEntry]
  def get(key: String): Option[ClaimEntry]
  def markComplete(key: String): Unit
}

/** In-memory CAS registry — the sandbox stand-in for the external
  * coordinator (same contract a DynamoDB conditional put gives:
  * `attributeNotExists(key)`).
  */
final class InMemoryCasRegistry extends CasRegistry {
  private val m = new ConcurrentHashMap[String, ClaimEntry]()
  override def claim(key: String, entry: ClaimEntry): Option[ClaimEntry] =
    Option(m.putIfAbsent(key, entry))
  override def get(key: String): Option[ClaimEntry] = Option(m.get(key))
  override def markComplete(key: String): Unit =
    m.computeIfPresent(key, (_, e) => e.copy(complete = true))
}

/** File-backed CAS registry: the cross-PROCESS coordinator for
  * deployments (and specs) where writers are separate JVMs sharing a
  * posix/NFS path but the DATA store has no atomic primitive — the
  * registry file is tiny and created with `CREATE_NEW`, which the
  * filesystem makes atomic, standing in for a DynamoDB conditional
  * put exactly like [[InMemoryCasRegistry]] does in-process.
  * `markComplete` rewrites via temp + atomic move; concurrent
  * completers write identical content, so the race is harmless.
  */
final class FileCasRegistry(dir: Path) extends CasRegistry {
  Files.createDirectories(dir)

  private def fileOf(key: String): Path =
    // keys are destination paths; encode to one flat name
    dir.resolve(java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(key.getBytes(StandardCharsets.UTF_8)))

  private def write(e: ClaimEntry): Array[Byte] =
    s"${e.owner}\n${e.tmpKey}\n${e.complete}"
      .getBytes(StandardCharsets.UTF_8)

  private def read(p: Path): ClaimEntry = {
    val Array(o, t, c) = new String(Files.readAllBytes(p),
      StandardCharsets.UTF_8).split("\n", 3)
    ClaimEntry(o, t, c.toBoolean)
  }

  override def claim(key: String, entry: ClaimEntry): Option[ClaimEntry] = {
    val f = fileOf(key)
    // Stage the full 3-line payload to a unique temp file and publish
    // with link(2) (the PosixCommitOwner pattern): a claim file is
    // FULLY WRITTEN the instant it becomes visible, so a concurrent
    // loser's read() never sees a partial entry, and a crash before
    // the link leaves only an orphan temp — never a wedged,
    // unparseable claim with no recoverable tmpKey.
    val tmp = dir.resolve(s".tmp-claim-${UUID.randomUUID()}")
    Files.write(tmp, write(entry))
    try {
      Files.createLink(f, tmp)
      None
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => Some(read(f))
    } finally Files.deleteIfExists(tmp)
  }

  override def get(key: String): Option[ClaimEntry] = {
    val f = fileOf(key)
    if (Files.exists(f)) Some(read(f)) else None
  }

  override def markComplete(key: String): Unit = {
    val f = fileOf(key)
    if (Files.exists(f)) {
      val e = read(f).copy(complete = true)
      val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}")
      Files.write(tmp, write(e))
      Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }
}

/** Put-if-absent over a store with NO atomic primitive, serialized by
  * an external CAS (the Delta `BaseExternalLogStore` protocol, public
  * design):
  *
  *   1. write the bytes to a UNIQUE temp key (unique names never
  *      collide, so a blind PUT is safe);
  *   2. CAS-claim the destination key, recording the temp key;
  *   3. the winner copies temp → destination and marks the claim
  *      complete. Losers (and readers, via [[recover]]) REPAIR an
  *      incomplete claim by performing that same copy from the
  *      winner's temp — so a winner crash between claim and copy
  *      leaves a self-healing log, never a torn one.
  *
  * The destination key is only ever written with the winner's bytes
  * (by the winner or by repairers copying the winner's temp), so the
  * store's lack of write atomicity is harmless: concurrent writers of
  * the same key write identical content.
  */
final class ExternalCasCommitOwner(registry: CasRegistry,
    store: ObjectStoreOps, ownerId: String = UUID.randomUUID().toString)
    extends CommitOwner {

  /** Best-effort GC of a staged temp object. Once the publish outcome
    * is decided the temp is pure garbage, so a transient delete failure
    * (an S3 throttle, say) must never change the outcome the caller
    * observes — a retry after a spurious throw would see the complete
    * claim, return false, and make a durably-committed writer believe
    * it lost its own commit.
    */
  private def gcTemp(tmp: Path): Unit =
    try store.delete(tmp) catch { case _: Exception => () }

  private def repair(dest: Path, e: ClaimEntry): Unit =
    if (!e.complete) {
      val tmp = dest.getParent.resolve(e.tmpKey)
      // Fetch the winner's staged bytes FIRST. A failed get is the only
      // benign failure in repair: the winner (or another repairer)
      // finished and GC'd its temp between our registry read and this
      // get — benign IFF the claim is now complete. Any other failure
      // (in particular our own put(dest) tearing mid-write) must
      // surface, or a torn destination could be left behind a
      // complete=true claim with no error reported.
      val staged =
        try Some(store.get(tmp))
        catch {
          case err: Exception =>
            if (registry.get(dest.toString).exists(_.complete)) None
            else throw err
        }
      staged.foreach { bytes =>
        // Re-check completeness immediately before writing: if the
        // winner finished while we held the bytes, dest is already
        // durable and re-putting would only reopen a torn-write window
        // over a good object.
        if (!registry.get(dest.toString).exists(_.complete)) {
          // Unconditional re-copy otherwise: `exists(dest)` proves
          // nothing on a store whose PUTs are non-atomic — a winner
          // dying mid-copy leaves a torn object that exists. Re-putting
          // the winner's temp bytes is idempotent (only winner content
          // is ever written to dest, by anyone) and heals the tear.
          store.put(dest, bytes)
          registry.markComplete(dest.toString)
        }
        gcTemp(tmp) // claim complete — the staged copy is garbage
      }
    }

  override def putIfAbsent(dest: Path, bytes: Array[Byte]): Boolean = {
    val key = dest.toString
    registry.get(key) match {
      case Some(e) => repair(dest, e); false
      case None =>
        val tmpKey = s".tmp-cas-${UUID.randomUUID()}"
        val tmp = dest.getParent.resolve(tmpKey)
        store.put(tmp, bytes) // durable first
        registry.claim(key, ClaimEntry(ownerId, tmpKey,
          complete = false)) match {
          case Some(existing) =>
            // Lost the claim: our staged bytes are garbage whether or
            // not repairing the winner's publish succeeds.
            try repair(dest, existing) finally gcTemp(tmp)
            false
          case None =>
            store.put(dest, bytes)
            registry.markComplete(key)
            gcTemp(tmp) // complete — repairers no longer need it
            true
        }
    }
  }

  override def recover(dest: Path): Unit =
    registry.get(dest.toString).foreach(repair(dest, _))

  override def overwrite(dest: Path, bytes: Array[Byte]): Unit =
    store.put(dest, bytes) // LWW pointer: plain PUT is the contract
}

/** The BROKEN owner — naive check-then-write on a non-atomic store.
  * Exists only for the control arm of the concurrency spec: two
  * writers racing through THIS both think they won, which is exactly
  * the lost-update the CAS protocol prevents. Never used by
  * production paths.
  */
final class NaiveCheckThenWriteOwner(store: ObjectStoreOps)
    extends CommitOwner {
  override def putIfAbsent(dest: Path, bytes: Array[Byte]): Boolean =
    if (store.exists(dest)) false
    else { store.put(dest, bytes); true } // TOCTOU window — the bug
  override def overwrite(dest: Path, bytes: Array[Byte]): Unit =
    store.put(dest, bytes)
}

object CommitOwner {
  /** Convenience for specs asserting winner content. */
  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
