package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The external-CAS commit owner END TO END: separate PROCESSES (not
  * just threads) racing the commit primitive through the file-backed
  * registry, and the full [[TxLogTable]] surface (merge / checkpoint /
  * vacuum / time travel / CDC) running over a CAS owner instead of the
  * posix default. This is the deployment story the CommitOwnerSpec
  * unit arms prove piecewise: an object store with non-atomic PUTs
  * plus one external compare-and-swap gives a multi-writer,
  * multi-process transaction log with no torn or lost commits.
  */
class CasEndToEndSpec extends SparkSpec {

  test("three PROCESSES racing the commit primitive serialize with no torn or lost commits") {
    val root = Files.createTempDirectory("casrace_log").toString
    val casDir = Files.createTempDirectory("casrace_reg").toString
    val perWriter = 12
    val writers = Seq("wA", "wB", "wC")
    val java = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val cp = System.getProperty("java.class.path")
    val procs = writers.map { w =>
      new ProcessBuilder(java, "-cp", cp, "graft.sources.CasRaceMain",
        root, casDir, w, perWriter.toString)
        .redirectErrorStream(true).start()
    }
    val outs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      (p.waitFor(), out)
    }
    outs.foreach { case (code, out) =>
      assert(code == 0, s"writer subprocess failed ($code): $out")
    }
    // every committed version is contiguous from 0, untorn (full
    // payload with the end marker), and owned by exactly one writer
    val s = Files.list(Paths.get(root))
    val versions = try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => (p.getFileName.toString.dropRight(5).toLong,
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
      .toList.sortBy(_._1)
    finally s.close()
    assert(versions.size == perWriter * writers.size,
      s"expected ${perWriter * writers.size} commits, saw ${versions.size}")
    assert(versions.map(_._1) == (0L until versions.size.toLong).toList,
      "versions must be contiguous from 0")
    versions.foreach { case (v, body) =>
      assert(body.endsWith("\"end\":true}"), s"torn commit at v$v: $body")
      assert(body.contains(s"\"v\":$v"), s"cross-wired commit at v$v")
    }
    val byWriter = versions.groupBy(_._2.split("\"")(3)) // writer field
    assert(byWriter.keySet == writers.toSet)
    assert(byWriter.values.forall(_.size == perWriter),
      s"per-writer wins: ${byWriter.view.mapValues(_.size).toMap}")
    // zero temp litter: every staged object was GC'd on every path
    val s2 = Files.list(Paths.get(root))
    val litter = try s2.iterator().asScala
      .filter(_.getFileName.toString.startsWith(".tmp-cas-")).toList
    finally s2.close()
    assert(litter.isEmpty, s"leaked temp objects: $litter")
  }

  test("TxLogTable over a CAS owner: concurrent merges, checkpoint, vacuum, time travel") {
    val root = Files.createTempDirectory("castable").toString
    val casDir = Files.createTempDirectory("castable_reg").toString
    def owner(id: String) = new ExternalCasCommitOwner(
      new FileCasRegistry(Paths.get(casDir)), LocalObjectStoreOps, id)
    import spark.implicits._
    val t1 = new TxLogTable(spark, root, owner("w1"))
    val t2 = new TxLogTable(spark, root, owner("w2"))
    t1.ensureExists(Seq((1L, "a", 0L)).toDF("k", "v", "ts").schema)
    // two table instances (distinct owner identities) merging
    // concurrently: the CAS serializes them — no lost update
    val th1 = new Thread(() => t1.merge(
      (1L to 40L).map(k => (k, s"w1-$k", 1L)).toDF("k", "v", "ts"),
      Seq("k"), Seq(col("ts").desc)))
    val th2 = new Thread(() => t2.merge(
      (21L to 60L).map(k => (k, s"w2-$k", 1L)).toDF("k", "v", "ts"),
      Seq("k"), Seq(col("ts").desc)))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert(t1.read().count() === 60L)
    val vPostMerge = t1.currentVersion
    // maintenance through the SAME owner: checkpoint folds history,
    // vacuum sweeps the dead dirs, both CAS-committed
    t1.checkpoint()
    t1.append(Seq((61L, "late", 2L)).toDF("k", "v", "ts"))
    val removed = t1.vacuum(retainHistory = false, minAgeMillis = 0L)
    assert(t1.read().count() === 61L)
    assert(removed.nonEmpty, "the losing merge's orphan dir must sweep")
    // time travel across the CAS-committed chain still serves
    assert(t2.readAt(vPostMerge).count() === 60L)
    // both writers' rows survived (no lost update on the overlap)
    val overlap = t1.read().filter(col("k").between(21L, 40L))
      .select(col("v")).collect().map(_.getString(0))
    assert(overlap.length == 20 &&
      overlap.forall(v => v.startsWith("w1-") || v.startsWith("w2-")))
    // zero temp litter in the log dir
    val s = Files.list(Paths.get(root, "_log"))
    val litter = try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith(".tmp-cas-")).toList
    finally s.close()
    assert(litter.isEmpty, s"leaked temp objects: $litter")
  }
}
