package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import graft.sources.TxStore.RichPath

/** The atomic-publish seam of the txlog commit protocol (the LogStore /
  * commit-coordinator idea from the public Delta design): everything
  * the multi-writer story needs from storage is ONE primitive —
  * put-if-absent with exactly one winner — plus a read-repair hook for
  * stores where that primitive is emulated. Since the Hadoop-FS
  * migration the destination is an `org.apache.hadoop.fs.Path` and the
  * owner receives the resolved `FileSystem`, so the same protocol
  * publishes to any scheme the deployment mounts.
  *
  * Three shipping shapes, matched to what the scheme guarantees
  * ([[CommitOwner.forStore]] picks):
  *   - [[PosixCommitOwner]] (`file:`): `link(2)` of a fully-written
  *     temp file fails with EEXIST atomically, so the filesystem
  *     itself is the coordinator. The only impl the sandbox exercises
  *     against real storage.
  *   - [[HadoopRenameCommitOwner]] (HDFS-like schemes): temp write +
  *     `FileContext.rename(…, Options.Rename.NONE)` — the public
  *     Delta HDFSLogStore recipe; the namenode makes the
  *     fail-if-exists rename atomic.
  *   - [[ExternalCasCommitOwner]] (object stores: S3/GCS/ABFS-style)
  *     with NEITHER hard links NOR atomic rename-if-absent: the
  *     winner is decided by an external compare-and-swap registry (in
  *     production a DynamoDB conditional put, etcd, or a commit
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
  def putIfAbsent(fs: FileSystem, dest: Path, bytes: Array[Byte]): Boolean

  /** Read-repair hook: make `dest` readable if a prior winner claimed
    * it but crashed before its object landed. No-op where the
    * filesystem publish is itself atomic.
    */
  def recover(fs: FileSystem, dest: Path): Unit = ()

  /** Last-writer-wins pointer update (the `_last_checkpoint` hint —
    * never correctness-bearing). Atomic swap where the store has one;
    * a plain PUT elsewhere (this default).
    */
  def overwrite(fs: FileSystem, dest: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(dest, true)
    try out.write(bytes) finally out.close()
  }
}

object CommitOwner {
  /** The publish primitive a filesystem actually provides. Loud on
    * schemes with no atomic primitive: silently falling back to
    * check-then-write would reintroduce exactly the lost-update race
    * the protocol exists to kill — object-store deployments must
    * construct their tables with an [[ExternalCasCommitOwner]] over
    * the deployment's CAS service.
    */
  def forStore(fs: FileSystem): CommitOwner = fs.getScheme match {
    case "file" => PosixCommitOwner
    case "hdfs" | "viewfs" | "webhdfs" | "swebhdfs" | "ofs" | "o3fs" =>
      HadoopRenameCommitOwner
    case other => throw new IllegalArgumentException(
      s"scheme '$other' has no atomic put-if-absent primitive; " +
        "construct the TxLogTable with an ExternalCasCommitOwner over " +
        "the deployment's CAS registry (DynamoDB conditional put, etcd, " +
        "or a commit service), or set " +
        s"$ConfKey=external-cas (+ $RegistryDirKey=<shared posix dir>) " +
        "to inject one by conf — reads never need an owner")
  }

  /** The conf seam object-store deployments configure instead of
    * threading an owner through every construction site (the SQL /
    * catalog / `format("txlog")` surfaces construct tables
    * internally and could not otherwise receive one).
    */
  val ConfKey = "spark.graft.txlog.commitOwner"
  val RegistryDirKey = "spark.graft.txlog.commitOwner.registryDir"

  /** Owner constructed from session conf, for schemes [[forStore]]
    * refuses: `spark.graft.txlog.commitOwner=external-cas` with
    * `…commitOwner.registryDir=<dir>` builds an
    * [[ExternalCasCommitOwner]] whose CAS registry is a
    * [[FileCasRegistry]] over that (shared posix/NFS) directory —
    * the sandbox stand-in for a DynamoDB/etcd coordinator; a real
    * deployment swaps the registry by constructing the owner
    * programmatically. None when the conf is unset. Unknown values
    * throw (a typo must not silently degrade to read-only).
    */
  def configured(spark: org.apache.spark.sql.SparkSession,
      fs: FileSystem): Option[CommitOwner] =
    spark.conf.getOption(ConfKey).map {
      case "external-cas" =>
        val dir = spark.conf.getOption(RegistryDirKey).getOrElse(
          throw new IllegalArgumentException(
            s"$ConfKey=external-cas requires $RegistryDirKey=<shared dir> " +
              "(the external CAS coordinator's location)"))
        new ExternalCasCommitOwner(
          new FileCasRegistry(java.nio.file.Paths.get(dir)),
          new HadoopObjectStoreOps(fs))
      case other => throw new IllegalArgumentException(
        s"unknown $ConfKey '$other' (supported: external-cas)")
    }

  /** Full resolution order of the publish owner for a store: an
    * explicitly constructed owner wins; else the scheme's native
    * primitive; else the conf-injected CAS owner. None = no owner
    * resolvable — fine for READS (snapshot reads need no commit
    * primitive), loud at the first commit attempt.
    */
  def resolveOption(explicit: CommitOwner,
      spark: org.apache.spark.sql.SparkSession,
      fs: FileSystem): Option[CommitOwner] =
    Option(explicit).orElse {
      try Some(forStore(fs))
      catch { case _: IllegalArgumentException => configured(spark, fs) }
    }

  /** Convenience for specs asserting winner content. */
  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}

/** POSIX publish (`file:` scheme): temp-write then `link(2)` into the
  * version slot. The link either creates the name or fails with EEXIST
  * — atomically, unlike `rename(2)` which silently replaces. The one
  * owner that legitimately drops below the Hadoop API: hard links are
  * a POSIX primitive `FileSystem` does not expose, and this owner is
  * BY CONTRACT only ever handed local paths.
  */
object PosixCommitOwner extends CommitOwner {
  private def local(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  override def putIfAbsent(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
    import java.nio.file.Files
    val d = local(dest)
    Files.createDirectories(d.getParent)
    val tmp = d.getParent.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try {
      Files.createLink(d, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def overwrite(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit = {
    import java.nio.file.Files
    val d = local(dest)
    val tmp = d.getParent.resolve(s".tmp-ow-${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    Files.move(tmp, d,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** HDFS-like publish: temp-write then `FileContext.rename` with
  * `Options.Rename.NONE` — the namenode rejects an existing
  * destination atomically (the public Delta HDFSLogStore design).
  * NOT registered for `file:` ([[CommitOwner.forStore]]): the local
  * FileContext emulates fail-if-exists as check-then-rename, which is
  * exactly the TOCTOU the posix hard-link owner avoids.
  */
object HadoopRenameCommitOwner extends CommitOwner {
  override def putIfAbsent(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
    val tmp = dest.getParent.resolve(s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    try {
      FileContext.getFileContext(fs.getUri, fs.getConf)
        .rename(tmp, dest, Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException if fs.exists(dest) => false
    } finally { fs.delete(tmp, false); () }
  }

  /** LWW pointer: delete + rename. The not-atomic gap (a reader may
    * observe the pointer absent mid-swap) is benign by the pointer's
    * contract — discovery falls back to the manifest walk.
    */
  override def overwrite(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = dest.getParent.resolve(s".tmp-ow-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"pointer swap failed for $dest")
    }
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

/** Pass-through impl over a Hadoop filesystem, restricted to the
  * non-atomic surface above — what a real S3 client offers. The
  * sandbox (and the multi-process CAS specs) run it over `file:`.
  */
final class HadoopObjectStoreOps(fs: FileSystem) extends ObjectStoreOps {
  override def exists(p: Path): Boolean = fs.exists(p)
  override def put(p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true) // plain overwriting PUT — no atomicity
    try out.write(bytes) finally out.close()
  }
  override def get(p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }
  override def delete(p: Path): Unit = { fs.delete(p, false); () }
}

/** Local-filesystem stand-in with byte-level write visibility (plain
  * `java.nio` writes — a torn write IS observable mid-flight, which
  * the adversarial specs rely on). Deployment code never touches it;
  * [[HadoopObjectStoreOps]] is the scheme-portable twin.
  */
object LocalObjectStoreOps extends ObjectStoreOps {
  import java.nio.file.Files
  private def local(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)
  override def exists(p: Path): Boolean = Files.exists(local(p))
  override def put(p: Path, bytes: Array[Byte]): Unit = {
    val d = local(p)
    Files.createDirectories(d.getParent)
    Files.write(d, bytes) // plain overwriting write — no atomicity
  }
  override def get(p: Path): Array[Byte] = Files.readAllBytes(local(p))
  override def delete(p: Path): Unit = { Files.deleteIfExists(local(p)); () }
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
  * posix/NFS path but the DATA store has no atomic primitive — a tiny
  * registry file published by hard link (atomic create of a
  * fully-written entry), standing in for a DynamoDB conditional put
  * exactly like [[InMemoryCasRegistry]] does in-process. Deliberately
  * `java.nio`: the registry is NOT part of the object store — it is
  * the external coordinator, and this impl's contract is a posix
  * mount. `markComplete` rewrites via temp + atomic move; concurrent
  * completers write identical content, so the race is harmless.
  */
final class FileCasRegistry(dir: java.nio.file.Path) extends CasRegistry {
  import java.nio.file.Files
  Files.createDirectories(dir)

  private def fileOf(key: String): java.nio.file.Path =
    // keys are destination paths; encode to one flat name
    dir.resolve(java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(key.getBytes(StandardCharsets.UTF_8)))

  private def write(e: ClaimEntry): Array[Byte] =
    s"${e.owner}\n${e.tmpKey}\n${e.complete}"
      .getBytes(StandardCharsets.UTF_8)

  private def read(p: java.nio.file.Path): ClaimEntry = {
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

  override def putIfAbsent(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean = {
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

  override def recover(fs: FileSystem, dest: Path): Unit =
    registry.get(dest.toString).foreach(repair(dest, _))

  override def overwrite(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit =
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
  override def putIfAbsent(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Boolean =
    if (store.exists(dest)) false
    else { store.put(dest, bytes); true } // TOCTOU window — the bug
  override def overwrite(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit =
    store.put(dest, bytes)
}
