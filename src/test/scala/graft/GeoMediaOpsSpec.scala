package graft

import org.apache.spark.sql.functions._

import graft.geo.{GeoQueries, Mercator}
import graft.multimodal.Multimodal

/** Behavior tests for the geo-query and multimodal operator batches. */
class GeoMediaOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tile math: tiles in [0, 2^z-1], column query matches the scalar kernel") {
    val rows = GeoQueries.tileMathQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 1023)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 1023)
    }
    // cross-check one synthetic point through the scalar Mercator kernel
    val id = 7L
    val lon = (id * 7919 % 36000) / 100.0 - 180.0 + 0.005
    val lat = (id * 104729 % 18000) / 100.0 - 90.0 + 0.005
    val (tx, tyTms) = Mercator.latLonToTile(lat, lon, 10)
    val hit = rows.exists(r => r.getLong(0) == tx && r.getLong(1) == Mercator.tmsToXYZ(tyTms, 10))
    assert(hit, s"tile of event 7 ($tx, ${Mercator.tmsToXYZ(tyTms, 10)}) must appear")
  }

  test("bbox filter: subset of the full scan, all points inside the widened box") {
    val n = GeoQueries.bboxFilterQuery(spark, sf0001).agg(sum($"n")).collect().head.getLong(0)
    val total = Tables.eventsRaw(spark, sf0001).count()
    assert(n > 0 && n < total)
  }

  test("haversine: distances positive, below the antipodal bound") {
    val rows = GeoQueries.haversineQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getDouble(1)
      assert(avg > 0 && avg <= math.Pi * 6371000.0)
    }
  }

  test("media features: byte stats match a direct computation") {
    val feats = Multimodal.mediaFeaturesQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text").collect().take(20)
    docs.foreach { d =>
      val bytes = d.getString(1).getBytes("UTF-8")
      val (mean, std, len) = feats(d.getLong(0))
      assert(len === bytes.length)
      val m = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      assert(math.abs(mean - m) < 1e-3)
      assert(std >= 0)
    }
  }

  test("media pipeline decodes JP2 payloads for real (stats on actual pixel planes)") {
    val w = 40; val h = 30
    val px = Array.tabulate(w * h)(i => (i * 13) % 256)
    val jp2 = graft.raster.Jp2.encodeJp2(w, h, 8, Array(px), 2)
    val img = Multimodal.decodeImage(jp2).getOrElse(fail("jp2 payload did not decode"))
    assert(img.width == w && img.height == h && img.channels == 1)
    assert(img.pixels.map(_ & 0xff).toSeq == px.toSeq)
    val (mean, _) = Multimodal.StubCodecs.imageStats(jp2)
    val expected = px.sum.toDouble / px.length
    assert(math.abs(mean - expected) < 1e-9, s"jp2 stats not from decoded pixels: $mean vs $expected")
  }

  test("media pipeline decodes single-band TIFF payloads through the COG reader") {
    val w = 48; val h = 20
    val px = Array.tabulate(w * h)(i => ((i * 11) % 256).toByte)
    val tif = graft.raster.Cog.encode(w, h, px, tileSize = 16)
    val img = Multimodal.decodeImage(tif).getOrElse(fail("tiff payload did not decode"))
    assert(img.width == w && img.height == h && img.channels == 1)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("phash: near-identical PNGs pair within Hamming 3; a different image does not") {
    import graft.raster.Png
    // a 32x24 grayscale gradient; B = A with a handful of pixels nudged
    // by one level (a re-encode-style perturbation); C = inverted ramp
    val w = 32; val h = 24
    def px(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => (f(i % w, i / w) & 0xff).toByte)
    val a = Png.encodeGray(w, h, px((x, y) => x * 7 + y))
    val b = Png.encodeGray(w, h, px((x, y) => x * 7 + y + (if (x == 5 && y < 3) 1 else 0)))
    val c = Png.encodeGray(w, h, px((x, y) => 255 - x * 7 - y * 3))
    val media = Seq((1L, a), (2L, b), (3L, c)).toDF("media_id", "payload")
    // real decode path: identical gradients hash identically
    assert(Multimodal.dhash60(a) === Multimodal.dhash60(b) || // perturbation below grid resolution…
      java.lang.Long.bitCount(Multimodal.dhash60(a) ^ Multimodal.dhash60(b)) <= 3) // …or within 3 bits
    val pairs = Multimodal.phashCandidates(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical images must pair: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), s"distinct image must not pair: $pairs")
    // non-PNG payloads fall back to the deterministic byte plane the
    // SQL oracle recomputes (q_phash)
    assert(Multimodal.dhash60("hello world hello world".getBytes("UTF-8")) ===
      Multimodal.dhash60("hello world hello world".getBytes("UTF-8")))
  }

  test("thumbnails: real PNG payloads resize aspect-fit and re-encode; dims match the reference rule") {
    import graft.raster.Png
    // 100x40 gradient: landscape → thumb pinned to width
    val w = 100; val h = 40
    val src = Png.encodeGray(w, h, Array.tabulate(w * h)(i => ((i % w) * 2).toByte))
    val media = Seq((1L, src, w, h)).toDF("media_id", "payload", "width", "height")
    val t = Multimodal.thumbnails(media, thumbSize = 50).collect().head
    assert((t.getInt(1), t.getInt(2)) === ((50, 20))) // trunc(50/100*40)=20
    val dec = Png.decode(t.getAs[Array[Byte]](3)).get
    assert((dec.width, dec.height) === ((50, 20)))
    // nearest-neighbour: thumb pixel (x,y) samples src (x*100/50, y*40/20)
    val exp = (10 * 2 * 2).toByte // thumb x=10 → src x=20 → value 40
    assert(dec.pixels(5 * 50 + 10) === exp)
    // the scalar rule itself: portrait pins height, floor 1 guards slivers
    assert(Multimodal.thumbTarget(40, 100, 50) === ((20, 50)))
    assert(Multimodal.thumbTarget(10000, 10, 256) === ((256, 1)))
  }

  test("frame sample: 4 frames per non-empty doc, frame bytes in (0, 16]") {
    val rows = Multimodal.frameSampleQuery(spark, sf0001).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.forall(_._2.length == 4))
    rows.foreach(r => assert(r.getInt(2) > 0 && r.getInt(2) <= 16))
  }

  test("status query: classifications cover all four states") {
    val m = graft.operators.Relational.statusQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("not_indexed", "deleted", "not_modified", "modified").subsetOf(m.keySet))
    // fs drops every 17th (deleted unless also dropped from index);
    // index drops every 19th (not_indexed unless also dropped from fs)
    val ids = Tables.eventsRaw(spark, sf0001).select($"event_id").collect().map(_.getLong(0))
    assert(m("deleted") === ids.count(i => i % 17 == 0 && i % 19 != 0))
    assert(m("not_indexed") === ids.count(i => i % 19 == 0 && i % 17 != 0))
  }
}
