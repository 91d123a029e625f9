package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop filesystem registered under the fake scheme `mocks3://`,
  * delegating to [[RawLocalFileSystem]] — the spec stand-in for an
  * object store: every IO lands on local disk, but the SCHEME is one
  * [[CommitOwner.forStore]] refuses (no atomic put-if-absent
  * primitive), so the commit-owner conf seam is what makes writes
  * possible. Registered per test via
  * `sparkContext.hadoopConfiguration.set("fs.mocks3.impl", …)` —
  * exactly how a real deployment mounts `s3a://`.
  *
  * The delegate's posix rename/create primitives are NEVER relied on
  * by the paths under test: the conf-injected
  * [[ExternalCasCommitOwner]] writes through [[HadoopObjectStoreOps]]
  * (blind PUTs) and serializes through the CAS registry.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
}
