package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tiny main for the REAL two-process grouped-swap test: from a
  * separate JVM, flips an [[AliasGroup]] between two consistent
  * states — `(valueA1, valueA2)` / `(valueB1, valueB2)` across two
  * member pointers — `rounds` times, then drops a `.swaps-done`
  * marker. Runs without a SparkSession: the group manifest is pure
  * Hadoop-FileSystem state, so a reader in ANOTHER process observing
  * a mixed pair would prove the manifest commit is not atomic across
  * process boundaries (the parent test asserts it never does).
  *
  * args: groupDir ptr1 ptr2 valueA1 valueA2 valueB1 valueB2 rounds
  */
object GroupSwapMain {
  def main(args: Array[String]): Unit = {
    val Array(group, ptr1, ptr2, a1, a2, b1, b2, rounds) = args
    val groupDir = new Path(group)
    val fs = groupDir.getFileSystem(new Configuration())
    (1 to rounds.toInt).foreach { i =>
      val (v1, v2) = if (i % 2 == 0) (a1, a2) else (b1, b2)
      AliasGroup.swap(fs, groupDir,
        Seq(new Path(ptr1) -> v1, new Path(ptr2) -> v2))
    }
    fs.create(new Path(groupDir.getParent, ".swaps-done"), true).close()
  }
}
