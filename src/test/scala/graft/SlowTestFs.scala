package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A deliberately-hung filesystem for the planning-deadline test: every
  * open blocks far past the configured planning-read timeout, simulating a
  * wedged metadata-store GET. Registered under scheme `graftslow` by the
  * test that uses it.
  */
class SlowTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftslow"
  override def getUri: URI = URI.create("graftslow:///")
  override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    Thread.sleep(30000)
    super.open(p, bufferSize)
  }
}
