package graft

import graft.sources.ArrowIpc
import graft.sources.ArrowIpc._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow map + union (dense and sparse) conformance.
  *
  * Producers/validators: committed pyarrow 16.1 fixtures
  * (tools/gen_arrow_fixtures.py — map.arrow / map_zstd.arrow /
  * union_dense.arrow / union_sparse.arrow, values deterministic
  * formulas of the row index, re-read by pyarrow at capture), plus
  * LIVE Arrow Java both directions: our writer's bytes read by
  * ArrowFileReader, and Arrow Java re-serializing the pyarrow fixture
  * through ArrowFileWriter with our reader decoding the fresh bytes. */
class ArrowMapUnionSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/arrow/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes()
    finally in.close()
  }

  private def cols(batches: Seq[Batch]): Array[Vector[Any]] = {
    val n = batches.map(_.columns.length).max
    Array.tabulate(n)(c => batches.flatMap(_.columns(c)).toVector)
  }

  private def alloc() = new org.apache.arrow.memory.RootAllocator()

  // ------------------------------------------- generator formula mirrors

  /** map.arrow row i: null when i%6==5, else (i%4) entries
    * ("k{i}_{j}" -> i*10+j, value null when (i+j)%5==4). */
  private def expectedMap(i: Int): Vector[Vector[Any]] =
    Vector.tabulate(i % 4) { j =>
      Vector[Any](s"k${i}_$j", if ((i + j) % 5 == 4) null else java.lang.Long.valueOf(i * 10L + j))
    }

  private def checkMapFixture(schema: ASchema, batches: Seq[Batch], n: Int): Unit = {
    assert(schema.fields.map(_.name) == Seq("m", "k"))
    val m = schema.fields.head
    assert(m.tpe == AMap(keysSorted = false))
    assert(m.children.head.name == "entries" && !m.children.head.nullable)
    assert(m.children.head.children.map(_.name) == Seq("key", "value"))
    assert(!m.children.head.children.head.nullable)
    val c = cols(batches)
    assert(c(0).length == n)
    for (i <- 0 until n) {
      if (i % 6 == 5) assert(c(0)(i) == null, s"m[$i] should be null")
      else assert(c(0)(i) == expectedMap(i), s"m[$i]: got ${c(0)(i)}")
      assert(c(1)(i) == i.toLong)
    }
  }

  /** union fixtures row i: num slot (value i*7, null when i%12==6)
    * when i%3==0, else word slot ("w{i%11}", null when i%10==7). */
  private def expectedUnion(i: Int, numTid: Int, wordTid: Int): Vector[Any] =
    if (i % 3 == 0) Vector[Any](numTid, if (i % 12 == 6) null else java.lang.Long.valueOf(i * 7L))
    else Vector[Any](wordTid, if (i % 10 == 7) null else s"w${i % 11}")

  private def checkUnionFixture(schema: ASchema, batches: Seq[Batch], n: Int,
      dense: Boolean, numTid: Int, wordTid: Int): Unit = {
    assert(schema.fields.map(_.name) == Seq("u", "k"))
    val u = schema.fields.head
    assert(u.tpe == AUnion(dense, Seq(numTid, wordTid)))
    assert(u.children.map(_.name) == Seq("num", "word"))
    val c = cols(batches)
    assert(c(0).length == n)
    for (i <- 0 until n) {
      assert(c(0)(i) == expectedUnion(i, numTid, wordTid), s"u[$i]: got ${c(0)(i)}")
      assert(c(1)(i) == i.toLong)
    }
  }

  // ------------------------------------------------------ pyarrow fixtures

  test("map.arrow: pyarrow map<utf8,int64> decodes (nulls in maps and values, 3 batches)") {
    val (schema, batches) = ArrowIpc.readFileBytes(fixture("map.arrow"))
    assert(batches.map(_.rows) == Seq(16, 16, 5))
    checkMapFixture(schema, batches, 37)
  }

  test("map_zstd.arrow: compressed map bodies decode via the in-tree codec") {
    val (schema, batches) = ArrowIpc.readFileBytes(fixture("map_zstd.arrow"))
    checkMapFixture(schema, batches, 37)
  }

  test("union_dense.arrow: pyarrow dense union with non-contiguous type ids (2, 5)") {
    val (schema, batches) = ArrowIpc.readFileBytes(fixture("union_dense.arrow"))
    assert(batches.map(_.rows) == Seq(20, 17))
    checkUnionFixture(schema, batches, 37, dense = true, numTid = 2, wordTid = 5)
  }

  test("union_sparse.arrow: pyarrow sparse union (default contiguous ids)") {
    val (schema, batches) = ArrowIpc.readFileBytes(fixture("union_sparse.arrow"))
    checkUnionFixture(schema, batches, 37, dense = false, numTid = 0, wordTid = 1)
  }

  // --------------------------------------------------------- our writer

  private val mapSchema = ASchema(Seq(
    AField("m", nullable = true, AMap(keysSorted = false), Seq(
      AField("entries", nullable = false, AStruct, Seq(
        AField("key", nullable = false, AUtf8),
        AField("value", nullable = true, AInt(64, signed = true)))))),
    AField("k", nullable = false, AInt(64, signed = true))))

  private def mapColumns(n: Int): Array[Array[Any]] = Array(
    Array.tabulate[Any](n)(i => if (i % 6 == 5) null else expectedMap(i)),
    Array.tabulate[Any](n)(i => java.lang.Long.valueOf(i.toLong)))

  private def unionSchema(dense: Boolean, tids: Seq[Int]) = ASchema(Seq(
    AField("u", nullable = false, AUnion(dense, tids), Seq(
      AField("num", nullable = true, AInt(64, signed = true)),
      AField("word", nullable = true, AUtf8)))))

  private def unionColumns(n: Int, tids: Seq[Int]): Array[Array[Any]] =
    Array(Array.tabulate[Any](n)(i => expectedUnion(i, tids(0), tids(1))))

  test("map round-trip: our writer -> our reader, all codecs") {
    for (codec <- Seq(-1, 0, 1)) {
      val bytes = ArrowIpc.encodeFile(mapSchema, Seq((mapColumns(37), 37)), codec)
      val (schema, batches) = ArrowIpc.readFileBytes(bytes)
      checkMapFixture(schema, batches, 37)
    }
  }

  test("union round-trip: our writer -> our reader, dense (ids 2,5) and sparse (ids 0,1)") {
    for ((dense, tids) <- Seq((true, Seq(2, 5)), (false, Seq(0, 1))); codec <- Seq(-1, 1)) {
      val s = unionSchema(dense, tids)
      val bytes = ArrowIpc.encodeFile(s, Seq((unionColumns(37, tids), 37)), codec)
      val (schema, batches) = ArrowIpc.readFileBytes(bytes)
      assert(schema.fields.head.tpe == AUnion(dense, tids))
      val c = cols(batches)
      for (i <- 0 until 37) assert(c(0)(i) == expectedUnion(i, tids(0), tids(1)), s"dense=$dense u[$i]")
    }
  }

  // ------------------------------------------ LIVE: our writer -> Arrow Java

  test("our map writer -> Arrow Java file reader, entries equal") {
    import org.apache.arrow.vector.ipc.ArrowFileReader
    import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
    val bytes = ArrowIpc.encodeFile(mapSchema, Seq((mapColumns(37), 37)))
    val a = alloc()
    try {
      val r = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), a)
      try {
        assert(r.loadNextBatch(), "Arrow Java rejects our map file")
        val root = r.getVectorSchemaRoot
        assert(root.getRowCount == 37)
        val mv = root.getVector("m")
        for (i <- 0 until 37) {
          if (i % 6 == 5) assert(mv.isNull(i), s"m[$i] should be null")
          else {
            val entries = mv.getObject(i).asInstanceOf[java.util.List[_]]
            val exp = expectedMap(i)
            assert(entries.size == exp.length, s"m[$i] size")
            for (j <- exp.indices) {
              val e = entries.get(j).asInstanceOf[java.util.Map[String, AnyRef]]
              assert(e.get("key").toString == exp(j)(0), s"m[$i][$j] key")
              assert(e.get("value") == exp(j)(1), s"m[$i][$j] value")
            }
          }
        }
      } finally r.close()
    } finally a.close()
  }

  test("our union writer -> Arrow Java file reader, selected values equal") {
    import org.apache.arrow.vector.ipc.ArrowFileReader
    import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
    for ((dense, tids) <- Seq((true, Seq(2, 5)), (false, Seq(0, 1)))) {
      val bytes = ArrowIpc.encodeFile(unionSchema(dense, tids), Seq((unionColumns(37, tids), 37)))
      val a = alloc()
      try {
        val r = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), a)
        try {
          assert(r.loadNextBatch(), s"Arrow Java rejects our ${if (dense) "dense" else "sparse"} union file")
          val root = r.getVectorSchemaRoot
          val uv = root.getVector("u")
          for (i <- 0 until 37) {
            val exp = expectedUnion(i, tids(0), tids(1))(1)
            val got = uv.getObject(i)
            if (exp == null) assert(got == null, s"u[$i] should be null")
            else assert(got == exp || got.toString == exp, s"u[$i]: got $got want $exp")
          }
        } finally r.close()
      } finally a.close()
    }
  }

  // --------------------------- LIVE: Arrow Java as producer -> our reader

  test("Arrow Java re-serializes the pyarrow map+union fixtures; our reader decodes its bytes") {
    import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
    import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
    for (name <- Seq("map.arrow", "union_dense.arrow", "union_sparse.arrow")) {
      val original = fixture(name)
      val a = alloc()
      val javaBytes =
        try {
          val r = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(original), a)
          try {
            val root = r.getVectorSchemaRoot
            val bos = new java.io.ByteArrayOutputStream()
            val w = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(bos))
            w.start()
            while (r.loadNextBatch()) w.writeBatch()
            w.end(); w.close()
            bos.toByteArray
          } finally r.close()
        } finally a.close()
      val (s1, b1) = ArrowIpc.readFileBytes(javaBytes)
      val (s2, b2) = ArrowIpc.readFileBytes(original)
      assert(s1 == s2, s"$name: schema drift through Arrow Java")
      assert(cols(b1).toSeq == cols(b2).toSeq, s"$name: value drift through Arrow Java")
    }
  }

  // ------------------------------------------------------------ Spark face

  test("Spark face: map -> MapType, union -> {type_id, variants} struct; scan() values") {
    val spark = TestSpark.spark
    assert(ArrowIpc.sparkSchema(ArrowIpc.readFileBytes(fixture("map.arrow"))._1) ==
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType, valueContainsNull = true), nullable = true),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, nullable = true))))
    val dir = java.nio.file.Files.createTempDirectory("arrow_mu").toFile
    try {
      for (name <- Seq("map.arrow", "union_dense.arrow")) {
        val p = new java.io.File(dir, name)
        java.nio.file.Files.write(p.toPath, fixture(name))
      }
      val mdf = ArrowIpc.scan(spark, Seq(new java.io.File(dir, "map.arrow").getPath))
      val mrows = mdf.collect().sortBy(_.getLong(1))
      assert(mrows.length == 37)
      for (i <- 0 until 37) {
        val got = mrows(i).getMap[String, Any](0)
        if (i % 6 == 5) assert(got == null)
        else assert(got.toMap == expectedMap(i).map(e => e(0).asInstanceOf[String] -> e(1)).toMap, s"row $i")
      }
      val udf2 = ArrowIpc.scan(spark, Seq(new java.io.File(dir, "union_dense.arrow").getPath))
      val urows = udf2.collect().sortBy(_.getLong(1))
      assert(udf2.schema.fields.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("type_id", "num", "word"))
      for (i <- 0 until 37) {
        val st = urows(i).getStruct(0)
        val exp = expectedUnion(i, 2, 5)
        assert(st.getByte(0) == exp(0).asInstanceOf[Int].toByte, s"row $i tag")
        if (i % 3 == 0) { assert(st.get(1) == exp(1) && st.get(2) == null, s"row $i num") }
        else { assert(st.get(1) == null && st.get(2) == exp(1), s"row $i word") }
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("DSv2 face: map column reads and prunes through spark.read.format(arrowipc)") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_mu_dsv2").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "map.arrow").toPath, fixture("map.arrow"))
      val df = spark.read.format("arrowipc").load(new java.io.File(dir, "map.arrow").getPath)
      val full = df.selectExpr("k", "m['k14_1'] as v").where("k = 14").collect()
      assert(full.length == 1 && full(0).getLong(1) == 141L)
      // pruned: only k survives — the map column must not be decoded
      val pruned = df.select("k")
      val rows = pruned.collect()
      assert(rows.length == 37 && rows.map(_.getLong(0)).sorted.toSeq == (0L until 37L))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  // ------------------------------------------------------------- hostility

  test("hostility: undeclared type ids, bad offsets, null map keys raise ArrowError") {
    // undeclared type id in the types buffer
    val tids = Seq(2, 5)
    val good = ArrowIpc.encodeFile(unionSchema(dense = true, tids), Seq((unionColumns(8, tids), 8)))
    // writer refuses an undeclared id outright
    intercept[ArrowError] {
      ArrowIpc.encodeFile(unionSchema(dense = true, tids),
        Seq((Array(Array[Any](Vector(9, java.lang.Long.valueOf(1L)))), 1)))
    }
    // writer refuses top-level union nulls
    intercept[ArrowError] {
      ArrowIpc.encodeFile(unionSchema(dense = true, tids), Seq((Array(Array[Any](null)), 1)))
    }
    // writer refuses null map keys
    intercept[ArrowError] {
      ArrowIpc.encodeFile(mapSchema, Seq((Array(
        Array[Any](Vector(Vector[Any](null, java.lang.Long.valueOf(1L)))),
        Array[Any](java.lang.Long.valueOf(0L))), 1)))
    }
    // reader: flip every byte of a valid dense-union file; each decode is
    // equal-bytes or ArrowError, never a raw index error
    val rnd = new scala.util.Random(181)
    for (_ <- 0 until 400) {
      val mutated = good.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
      try { ArrowIpc.readFileBytes(mutated); () }
      catch { case _: ArrowError => () }
    }
  }
}
