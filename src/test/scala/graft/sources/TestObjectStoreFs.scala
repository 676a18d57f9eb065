package graft.sources

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** Test double for an object-store FileSystem (the `s3a://` shape the
  * scan maps S3 inputs to — fastwarc-py/fastwarc/cli.py:291-348): a
  * registered non-`file:` scheme backed by the local disk. Proves the
  * scan path holds through Hadoop's FileSystem abstraction (URI
  * resolution, glob listing, open/seek) for any object-store scheme,
  * which is everything s3a needs from the engine — the egress-blocked
  * environment cannot exercise the real connector.
  */
class TestObjectStoreFs extends RawLocalFileSystem {
  private var uri: URI = _
  override def getScheme: String = "testfs"
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = Option(name.getAuthority) match {
      case Some(a) if a.nonEmpty => URI.create(s"${name.getScheme}://$a")
      case _ => URI.create(s"${name.getScheme}:///")
    }
  }
  override def getUri: URI = if (uri != null) uri else URI.create("testfs:///")
}
