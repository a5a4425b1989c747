package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tiny main for the REAL two-process lease test: acquires the
  * writer lease on `args(0)`, drops a `held-marker` file so the
  * parent test can observe the acquisition without parsing stdout,
  * holds for `args(1)` ms, then releases and drops a
  * `released-marker`. Runs without a SparkSession — the lease is
  * pure Hadoop-FileSystem state, which is the point: any JVM that
  * can reach the storage participates in the same arbitration.
  */
object LeaseHolderMain {
  def main(args: Array[String]): Unit = {
    val home = args(0)
    val holdMs = args(1).toLong
    val fs = new Path(home).getFileSystem(new Configuration())
    val tok = WriterLease.acquire(fs, home,
      ownerId = "ext@" + ProcessHandle.current().pid())
    fs.create(new Path(home, ".held-marker"), true).close()
    Thread.sleep(holdMs)
    WriterLease.release(fs, tok)
    fs.create(new Path(home, ".released-marker"), true).close()
  }
}
