package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale-probe dataset builder: deterministic N× replication of a
  * driver-generated SF directory with key-space shifting, so sf0.1 →
  * sf1 keeps every per-key cardinality and value distribution while
  * the row counts grow 10× (the driver's own generator is not
  * in-repo; this is the honest substitute for the scale probe).
  *
  * Replica r of each table shifts its keys by r × (maxKey+1):
  * lineitem/orders/customer/part/supplier/events all stay join-
  * consistent within a replica and disjoint across replicas. Two
  * content columns get replica-dependent rewrites so content-addressed
  * workloads are not degenerate 10-way duplicates:
  *
  *  - `documents.text`: a same-length vocabulary permutation per
  *    replica (each word maps to a word of identical length drawn
  *    from the corpus vocabulary, bijectively) — token lengths,
  *    zipf shape, doc lengths, and the WITHIN-replica duplicate
  *    structure are preserved, but replicas are not near-duplicates
  *    of each other, so MinHash/SimHash/n-gram workloads scale
  *    honestly instead of collapsing into 10× LSH buckets.
  *  - `embeddings.embedding`: a per-replica dimension permutation —
  *    norms and within-replica distances are exactly preserved,
  *    across-replica similarities decorrelate.
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [dstDir] [reps]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/testdata/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(32)
    import spark.implicits._

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    def shifted(df: DataFrame, shifts: Map[String, Long])(extra: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps)
        .map { r =>
          val s0 = shifts.foldLeft(df) { case (d, (c, base)) => d.withColumn(c, col(c) + lit(base * r)) }
          extra(s0, r)
        }
        .reduce(_ unionByName _)

    // key spans (maxKey+1) from the source so shifts never collide
    def span(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.get(0).asInstanceOf[Number].longValue + 1

    val custN = span("customer", "c_custkey")
    val partN = span("part", "p_partkey")
    val suppN = span("supplier", "s_suppkey")
    val ordN = span("orders", "o_orderkey")
    val evN = span("events", "event_id")
    val userN = span("events", "user_id")
    val docN = span("documents", "doc_id")
    val vecN = span("embeddings", "vec_id")

    // tiny dims: copy verbatim (regions/nations are fixed-cardinality)
    write(read("region"), "region")
    write(read("nation"), "nation")

    write(shifted(read("customer"), Map("c_custkey" -> custN))((d, _) => d), "customer")
    write(shifted(read("supplier"), Map("s_suppkey" -> suppN))((d, _) => d), "supplier")
    write(shifted(read("part"), Map("p_partkey" -> partN))((d, _) => d), "part")
    write(shifted(read("orders"), Map("o_orderkey" -> ordN, "o_custkey" -> custN))((d, _) => d), "orders")
    write(
      shifted(
        read("lineitem"),
        Map("l_orderkey" -> ordN, "l_partkey" -> partN, "l_suppkey" -> suppN))((d, _) => d),
      "lineitem")

    // events: shift ids/users; push each replica into its own time band
    // (35 days apart — the source spans ~28 h) so windows don't overlap
    write(
      shifted(read("events"), Map("event_id" -> evN, "user_id" -> userN)) { (d, r) =>
        d.withColumn("ts", col("ts") + expr(s"INTERVAL ${35 * r} DAYS"))
      },
      "events")

    // documents: per-replica letter rotation (caesar shift) — bijective,
    // length-preserving, and replica token sets are DISJOINT for r>0, so
    // the within-replica duplicate/near-dup structure replicates exactly
    // while replicas never near-match each other (a same-length vocab
    // permutation fails this: small length classes map words to
    // themselves and replicas become 10-way near-duplicates)
    val remap = udf { (text: String, r: Int) =>
      if (r == 0) text
      else text.map {
        case c if c >= 'a' && c <= 'z' => ('a' + (c - 'a' + r) % 26).toChar
        case c if c >= 'A' && c <= 'Z' => ('A' + (c - 'A' + r) % 26).toChar
        case c if c >= '0' && c <= '9' => ('0' + (c - '0' + r) % 10).toChar
        case c => c
      }
    }
    write(
      shifted(read("documents"), Map("doc_id" -> docN)) { (d, r) =>
        d.withColumn("text", remap($"text", lit(r)))
      },
      "documents")

    // embeddings: per-replica dimension permutation + sign flips — norms
    // and within-replica distances exactly preserved, across-replica
    // cosines decorrelate to ~0 (randomly-signed sums)
    val dim = read("embeddings").select(size($"embedding")).head.getInt(0)
    val dimPerms = (0 until reps).map { r =>
      if (r == 0) ((0 until dim).toArray, Array.fill(dim)(1f))
      else {
        val rnd = new scala.util.Random(0x5eedL ^ r)
        (rnd.shuffle((0 until dim).toVector).toArray, Array.fill(dim)(if (rnd.nextBoolean()) 1f else -1f))
      }
    }
    val dimPermsBc = spark.sparkContext.broadcast(dimPerms)
    val permVec = udf { (v: Seq[Float], r: Int) =>
      val (p, s) = dimPermsBc.value(r)
      Array.tabulate(v.length)(i => v(p(i)) * s(i))
    }
    write(
      shifted(read("embeddings"), Map("vec_id" -> vecN)) { (d, r) =>
        d.withColumn("embedding", permVec($"embedding", lit(r)))
      },
      "embeddings")

    spark.stop()
  }
}
