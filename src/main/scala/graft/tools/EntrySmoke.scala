package graft.tools
import graft.{Sessions, SparkEntry}
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(8)
    val df = SparkEntry.entry(s)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, false)
    s.stop()
  }
}
