package graft.tools

object ZstdProbe3 {
  def main(args: Array[String]): Unit = {
    // rebuild the failing weights path manually
    val data = (0 until 500).map(i => s"""{"id":$i,"t":"word${i % 37} common phrase"}""").mkString("\n").getBytes
    val freq = new Array[Int](256)
    data.foreach(b => freq(b & 0xff) += 1)
    // replicate huffLengths via reflection-free copy: just print the histogram of code lengths
    // easiest: call through the package-private API
    println("distinct bytes=" + freq.count(_ > 0))
  }
}
