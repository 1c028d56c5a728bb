package graft

import graft.sources.AvroOcf
import graft.sources.AvroOcf._
import org.apache.spark.sql.streaming.Trigger

/** Streaming twin for Avro OCF shards: files dropped in a landing
  * directory are ingested continuously — one shard from our writer,
  * one from avro-java (the live producer) — and the streamed union
  * equals the batch decode; schema drift fails loudly. */
class StreamAvroSpec extends SparkSuite {

  private val schemaJson =
    """{"type":"record","name":"S","fields":[
      |{"name":"id","type":"long"},{"name":"tag","type":["null","string"]}]}""".stripMargin

  private def javaShard(from: Int, n: Int): Array[Byte] = {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.fromString("deflate"))
    val bos = new java.io.ByteArrayOutputStream()
    w.create(schema, bos)
    for (i <- from until from + n) {
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("tag", if (i % 5 == 0) null else s"t${i % 7}")
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  test("avro shard landing zone: streamed rows equal the batch decode, both producers") {
    val dir = java.nio.file.Files.createTempDirectory("avrostream")
    try {
      val schema = AvroOcf.parseSchema(schemaJson)
      val ourRows = (40 until 65).map(i =>
        Vector[Any](i.toLong, if (i % 5 == 0) null else s"t${i % 7}"))
      java.nio.file.Files.write(dir.resolve("a.avro"), javaShard(0, 40))
      java.nio.file.Files.write(dir.resolve("b.avro"),
        AvroOcf.encodeFile(schema, ourRows, "zstandard"))
      val expected = AvroOcf.sparkType(schema).asInstanceOf[org.apache.spark.sql.types.StructType]
      val q = AvroOcf.rowsStream(spark, dir.toString, expected)
        .writeStream.format("memory").queryName("avro_stream_test")
        .trigger(Trigger.AvailableNow()).start()
      try {
        q.processAllAvailable()
        val got = spark.sql("select id, tag from avro_stream_test order by id").collect()
        assert(got.length == 65)
        assert(got(0).getLong(0) == 0L && got(64).getLong(0) == 64L)
        assert(got(13).getString(1) == s"t${13 % 7}")
        assert(got(40).isNullAt(1)) // 40 % 5 == 0
      } finally q.stop()
      // schema drift fails loudly with the path named
      val wrong = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("other", org.apache.spark.sql.types.LongType)))
      val q2 = AvroOcf.rowsStream(spark, dir.toString, wrong)
        .writeStream.format("memory").queryName("avro_stream_bad")
        .trigger(Trigger.AvailableNow()).start()
      try {
        val e = intercept[Exception] { q2.processAllAvailable() }
        def mentions(t: Throwable): Boolean =
          t != null && (Option(t.getMessage).exists(_.contains("schema drift")) || mentions(t.getCause))
        assert(mentions(e), s"unexpected: $e")
      } finally q2.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
