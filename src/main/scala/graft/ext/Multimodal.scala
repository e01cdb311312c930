package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs per-partition so a real codec binds
  * batch-wise (one codec init per partition, not per row).
  *
  * DECODE IS REAL, pure JVM, no codec library: [[parseHeader]] parses
  * format, dimensions and sample rate from the payload's magic bytes
  * (PNG IHDR, JPEG SOF marker scan, GIF logical screen descriptor, WAV
  * fmt chunk); [[decodeRaster]] decodes actual pixels (PNG via Inflater
  * + unfilter, BMP rows, GIF via LZW + palette, baseline JPEG via
  * Huffman + dequant + IDCT); [[decodePcm]] decodes actual WAV samples.
  * Perceptual features (phash/feat) are computed over decoded pixels;
  * only payloads outside that envelope (progressive JPEG, unknown
  * containers) fall back to a deterministic md5-derived stand-in at the
  * documented seam (mapPartitions, one init per partition, batch
  * iteration, output schema) where a full codec library would bind.
  *
  * Scale notes: media blobs dominate row size, so the asset table is
  * partitioned by content-hash prefix (uniform spread, no hot partitions)
  * and feature extraction is a projection — never a shuffle; extracted
  * features land in a narrow sidecar table joined back by `asset_id` only
  * when needed.
  */
object Multimodal {

  /** Typed envelope for a media asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("duration_ms", LongType))))))

  /** Wrap arbitrary source rows into the asset envelope: payload is the
    * raw bytes, id is the content hash (dedup-friendly), partition key is
    * the hash prefix. Rows with a NULL payload are dropped up front: they
    * would get a NULL asset_id (md5(NULL)), violating the envelope's
    * non-null id contract and silently vanishing from every equi-join on
    * asset_id (NULL never equals NULL) — filtering is explicit, not an
    * accident of join semantics. */
  def toAssets(src: DataFrame, bytesCol: String, mediaType: String): DataFrame =
    src.where(col(bytesCol).isNotNull).select(
      md5(col(bytesCol)).as("asset_id"),
      lit(mediaType).as("media_type"),
      col(bytesCol).cast("binary").as("payload"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"),
      substring(md5(col(bytesCol)), 1, 2).as("shard"))

  /** Parsed container-header metadata. */
  case class HeaderMeta(format: String, width: Option[Int], height: Option[Int],
                        sample_rate: Option[Int])

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def beShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** REAL magic-byte header parse — pure JVM, no codec:
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
    *    width/height at offsets 16/20;
    *  - JPEG: SOI then a marker scan to the first frame header (SOFn,
    *    n ∉ {4, 8, 12} — those are huffman/arithmetic tables, not
    *    frames), big-endian height/width at +5/+7 into the segment;
    *  - GIF: "GIF87a"/"GIF89a", little-endian u16 logical-screen
    *    width/height at 6/8;
    *  - WAV: "RIFF....WAVE", fmt-chunk scan for the little-endian u32
    *    sample rate (chunk-aligned walk, not a fixed offset — real files
    *    put LIST/JUNK chunks before fmt).
    * Anything else (or a truncated header) parses as "unknown"/None —
    * never a throw: a 100 TB corpus WILL contain garbage bytes. */
  def parseHeader(b: Array[Byte]): HeaderMeta = {
    if (b == null || b.length < 2) return HeaderMeta("unknown", None, None, None)
    // PNG
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return HeaderMeta("png", Some(beInt(b, 16)), Some(beInt(b, 20)), None)
    // JPEG: marker walk
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // Long cursor (as in the WAV chunk walk below): on a payload near
      // Int.MaxValue bytes, `i += 2 + len` (len ≤ 65535) can wrap an Int
      // cursor negative, slip past the `i + 3 < b.length` guard, and index
      // with a negative offset — the throw this parser promises never to
      // make. Long arithmetic can't wrap here and the guard bounds i.toInt.
      var i = 2L
      while (i + 3 < b.length && (b(i.toInt) & 0xff) == 0xff) {
        val o = i.toInt
        val marker = b(o + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd9 || marker == 0xda) {
          // EOI / SOS with no frame header seen: stop — past SOS lies
          // entropy-coded data (and past EOI arbitrary trailer bytes)
          // where a naive marker walk would misread payload bytes
          return HeaderMeta("jpeg", None, None, None)
        }
        else if (marker == 0x01 || marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
        else {
          val len = beShort(b, o + 2)
          if (len < 2) return HeaderMeta("jpeg", None, None, None)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            // progressive DCT (SOF2) is named explicitly: it parses as a
            // JPEG but sits outside the baseline decode envelope, and the
            // decode stage flags it `decoded = false` — callers can route
            // such payloads to an external codec instead of trusting the
            // stand-in features
            val fmt = if (marker == 0xc2) "jpeg-progressive" else "jpeg"
            if (i + 8 < b.length)
              return HeaderMeta(fmt, Some(beShort(b, o + 7)), Some(beShort(b, o + 5)), None)
            return HeaderMeta(fmt, None, None, None)
          }
          i += 2L + len
        }
      }
      return HeaderMeta("jpeg", None, None, None)
    }
    // GIF
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return HeaderMeta("gif", Some(leShort(b, 6)), Some(leShort(b, 8)), None)
    // AVI: RIFF container — the avih header carries frame dims
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') {
      return aviScan(b, wantFrames = false) match {
        case Some(m) => HeaderMeta("avi", Some(m.width), Some(m.height), None)
        case None    => HeaderMeta("avi", None, None, None)
      }
    }
    // WAV: RIFF container, chunk walk to "fmt "
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // Long cursor: a garbage chunk size near Int.MaxValue would wrap an
      // Int cursor negative (and wrap the loop guard), indexing out of
      // bounds — exactly the throw this parser promises never to make
      var i = 12L
      while (i + 8 <= b.length) {
        val o = i.toInt
        val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
        val sz = leInt(b, o + 4)
        if (isFmt) {
          if (i + 16 <= b.length && sz >= 8)
            return HeaderMeta("wav", None, None, Some(leInt(b, o + 12)))
          return HeaderMeta("wav", None, None, None)
        }
        if (sz < 0) return HeaderMeta("wav", None, None, None)
        i += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      return HeaderMeta("wav", None, None, None)
    }
    HeaderMeta("unknown", None, None, None)
  }

  // ---------- real pixel decode (pure JVM, no codec library) ----------

  /** Decoded raster: row-major 0–255 grayscale. */
  case class Raster(width: Int, height: Int, gray: Array[Int])

  // adversarial-header guard: refuse rasters a garbage width/height field
  // would otherwise allocate (100 TB corpora contain hostile bytes; a
  // 2^31-pixel "image" is a driver OOM, not a decode)
  private val MaxDim = 1 << 14
  private val MaxPixels = 1 << 24

  /** Decode an image payload to grayscale pixels — pure JVM, no codec
    * library. Supports the byte layouts the formats actually ship at
    * 8-bit depth: PNG color types 0/2/3/4/6 (gray, RGB, palette,
    * gray+alpha, RGBA) via `java.util.zip.Inflater` with all five
    * scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9),
    * non-interlaced; BMP 24-bit BI_RGB (bottom-up or top-down); GIF
    * first-frame LZW; baseline JPEG (SOF0/SOF1 — marker walk, canonical
    * Huffman, dequant, IDCT; see [[decodeJpeg]] for the envelope). RGB
    * collapses to luma via the integer BT.601 weights (299/587/114)/1000;
    * JPEG emits its Y channel directly. Anything else — truncated
    * streams, garbage chunk lengths, hostile dimensions, progressive
    * JPEG — returns None, NEVER throws (the [[parseHeader]] contract;
    * MultimodalSpec fuzzes it). */
  def decodeRaster(b: Array[Byte]): Option[Raster] = try {
    if (b == null || b.length < 8) None
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') decodePng(b)
    else if (b(0) == 'B' && b(1) == 'M' && b.length >= 54) decodeBmp(b)
    else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
             (b(4) == '7' || b(4) == '9') && b(5) == 'a') decodeGif(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) decodeJpeg(b)
    else None
  } catch { case _: Throwable => None }

  private def luma(r: Int, g: Int, bl: Int): Int = (r * 299 + g * 587 + bl * 114) / 1000

  private def decodePng(b: Array[Byte]): Option[Raster] = {
    if (b.length < 33) return None
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0; var interlace = 0
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8L
    var seenIhdr = false; var seenIend = false
    while (!seenIend && i + 8 <= b.length) {
      val o = i.toInt
      val len = beInt(b, o)
      if (len < 0 || i + 12 + len > b.length) return None
      val typ = new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = beInt(b, o + 8); h = beInt(b, o + 12)
          bitDepth = b(o + 16) & 0xff; colorType = b(o + 17) & 0xff
          interlace = b(o + 20) & 0xff
          seenIhdr = true
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + len)
        case "IDAT" => idat.write(b, o + 8, len)
        case "IEND" => seenIend = true
        case _ => ()
      }
      i += 12L + len
    }
    if (!seenIhdr || bitDepth != 8 || interlace != 0) return None
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || w.toLong * h > MaxPixels) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && plte == null) return None
    // inflate the zlib stream to exactly h filtered scanlines
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      off += n
      // 0 bytes while unfinished = truncated / dictionary-needing / stuck
      // stream — bail rather than spin
      if (n == 0 && !inf.finished()) { inf.end(); return None }
    }
    inf.end()
    if (off < raw.length) return None
    // undo per-scanline filters (bpp = channels at 8-bit depth)
    val out = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val rs = y * (stride + 1)
      val f = raw(rs) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(rs + 1 + x) & 0xff
        val left = if (x >= channels) out(y * stride + x - channels) else 0
        val up = if (y > 0) out((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= channels) out((y - 1) * stride + x - channels) else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor (PNG spec §9.4)
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(y * stride + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    // collapse channels to grayscale
    val gray = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val o = p * channels
      gray(p) = colorType match {
        case 0 | 4 => out(o)
        case 2 | 6 => luma(out(o), out(o + 1), out(o + 2))
        case 3 =>
          val pi = out(o) * 3
          if (pi + 2 >= plte.length) return None
          luma(plte(pi) & 0xff, plte(pi + 1) & 0xff, plte(pi + 2) & 0xff)
      }
      p += 1
    }
    Some(Raster(w, h, gray))
  }

  private def decodeBmp(b: Array[Byte]): Option[Raster] = {
    val dataOff = leInt(b, 10)
    val w = leInt(b, 18); val hRaw = leInt(b, 22)
    val bpp = leShort(b, 28); val compression = leInt(b, 30)
    if (bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw); val bottomUp = hRaw > 0
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || w.toLong * h > MaxPixels) return None
    val rowBytes = (w * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    if (dataOff < 0 || dataOff.toLong + rowBytes.toLong * h > b.length) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val ro = dataOff + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val o = ro + x * 3 // BGR order
        gray(y * w + x) = luma(b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, gray))
  }

  /** GIF decode: first frame, non-interlaced, global or local color
    * table, full LZW (GIF89a spec appendix F: variable code width
    * 3–12 bits LSB-first, clear/end codes, KwKwK case, deferred-clear
    * full-dictionary streams). Extensions (graphic control, comment,
    * application) are sub-block-walked and skipped. Interlaced frames
    * are out of envelope → None. */
  private def decodeGif(b: Array[Byte]): Option[Raster] =
    decodeGifFrames(b, maxFrames = 1).flatMap(_.headOption)

  /** All frames of a (possibly animated) GIF, each decoded through the
    * LZW path to its own grayscale raster. Frames are decoded as their
    * encoded rects — no disposal compositing: the use here is per-frame
    * FEATURES (hashes, stats), where the encoded frame is the honest
    * unit, not faithful animation playback. Refusals mirror
    * [[decodeRaster]] (interlaced, hostile dims, truncated LZW → None);
    * `maxFrames` bounds work on hostile frame-count bombs — a payload
    * claiming thousands of frames stops decoding at the cap instead of
    * holding the worker. Never throws. */
  def decodeGifFrames(b: Array[Byte], maxFrames: Int = 64): Option[Seq[Raster]] = try {
    if (b == null || b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F')
      return None
    val packed = b(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n); pos += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Raster]
    while (pos < b.length && frames.size < maxFrames) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label byte, then length-prefixed sub-blocks
          pos += 2
          while (pos < b.length && (b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
          pos += 1 // block terminator
        case 0x3b => // trailer: clean end of stream
          return if (frames.nonEmpty) Some(frames.toSeq) else None
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) return None
          val iw = leShort(b, pos + 5); val ih = leShort(b, pos + 7)
          val ipacked = b(pos + 9) & 0xff
          pos += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > b.length) return None
            ct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n); pos += 3 * n
          }
          if ((ipacked & 0x40) != 0) return None // interlaced
          if (ct == null) return None
          if (iw <= 0 || ih <= 0 || iw > MaxDim || ih > MaxDim ||
              iw.toLong * ih > MaxPixels) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff; pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (pos < b.length && (b(pos) & 0xff) != 0) {
            val n = b(pos) & 0xff
            if (pos + 1 + n > b.length) return None
            data.write(b, pos + 1, n); pos += 1 + n
          }
          pos += 1 // block terminator
          val idx = lzwDecode(minCode, data.toByteArray, iw * ih).getOrElse(return None)
          val gray = new Array[Int](iw * ih)
          var p = 0
          while (p < iw * ih) {
            val ci = idx(p) * 3
            if (ci + 2 >= ct.length) return None
            gray(p) = luma(ct(ci) & 0xff, ct(ci + 1) & 0xff, ct(ci + 2) & 0xff)
            p += 1
          }
          frames += Raster(iw, ih, gray)
        case _ => return None // garbage block tag
      }
    }
    if (frames.nonEmpty) Some(frames.toSeq) else None
  } catch { case _: Throwable => None }

  /** GIF-flavor LZW: variable-width codes packed LSB-first. The
    * dictionary is a prefix-link table (prefix/suffix arrays), so
    * emitting a sequence is an O(len) chain unwind — no per-entry byte
    * arrays, the dictionary is 4096×8 bytes flat regardless of image
    * size. Decodes exactly `nPix` indices; anything short (truncated
    * stream, early end code) or malformed (code beyond dictionary,
    * non-literal after clear) → None. */
  private def lzwDecode(minCode: Int, data: Array[Byte], nPix: Int): Option[Array[Int]] = {
    val clear = 1 << minCode; val endCode = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Int](4096)
    var dictSize = clear + 2
    var codeSize = minCode + 1
    val out = new Array[Int](nPix); var outN = 0
    val stack = new Array[Int](4097)
    var prev = -1; var firstOfPrev = 0
    var bitPos = 0L; val totalBits = data.length.toLong * 8
    var done = false
    while (!done && outN < nPix) {
      // read one code, LSB-first across byte boundaries
      if (bitPos + codeSize > totalBits) return None // truncated
      var code = 0; var j = 0
      while (j < codeSize) {
        val bp = bitPos + j
        code |= ((data((bp >>> 3).toInt) >> (bp & 7).toInt) & 1) << j
        j += 1
      }
      bitPos += codeSize
      if (code == clear) { dictSize = clear + 2; codeSize = minCode + 1; prev = -1 }
      else if (code == endCode) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a literal
        out(outN) = code; outN += 1
        prev = code; firstOfPrev = code
      } else {
        if (code > dictSize || (code == dictSize && dictSize >= 4096)) return None
        var sp = 0
        var c = code
        if (code == dictSize) { stack(sp) = firstOfPrev; sp += 1; c = prev } // KwKwK
        while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return None
        stack(sp) = c; sp += 1
        val first = c
        while (sp > 0) { sp -= 1; if (outN < nPix) { out(outN) = stack(sp); outN += 1 } }
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code; firstOfPrev = first
      }
    }
    if (outN == nPix) Some(out) else None
  }

  /** GIF-flavor LZW ENCODER — the inverse of [[lzwDecode]], used by
    * [[encodeGif]] to build multi-frame fixtures whose byte streams
    * exercise the decoder's real dictionary path (growth, code-width
    * bumps, KwKwK chains) rather than a degenerate uncompressed stream.
    * Dictionary is a HashMap keyed (prefixCode << 8 | suffix) — prefix
    * codes < 4096, suffixes < 256, so the key fits an Int. The encoder's
    * dict runs ONE entry ahead of the decoder's (the decoder adds the
    * entry for code k while processing code k+1), so the width bump fires
    * at (1 << codeSize) + 1 where the decoder's fires at 1 << codeSize —
    * the classic sync rule. At 4096 the dict freezes (matching the
    * decoder); no clear codes are emitted mid-stream. */
  private def lzwEncode(minCode: Int, indices: Array[Int]): Array[Byte] = {
    val clear = 1 << minCode; val endCode = clear + 1
    var dictSize = clear + 2
    var codeSize = minCode + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += codeSize
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8 }
    }
    emit(clear)
    if (indices.nonEmpty) {
      var prev = indices(0)
      var i = 1
      while (i < indices.length) {
        val c = indices(i)
        val key = Integer.valueOf((prev << 8) | c)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            if (dictSize == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          prev = c
        }
        i += 1
      }
      emit(prev)
    }
    emit(endCode)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    bits.toByteArray
  }

  /** Multi-frame grayscale GIF89a encoder (fixture builder, the
    * [[encodeGrayPng]] contract: never consumed by queries to produce
    * answers — [[decodeGifFrames]] must invert it through the real LZW
    * machinery). 256-entry grayscale global color table, so palette
    * index i decodes to luma EXACTLY i (BT.601 of (i,i,i) is i — the
    * closed form the oracles replay). Each frame ships behind a Graphics
    * Control Extension, exercising the decoder's extension-skip path. */
  def encodeGif(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == w * h, s"${f.length} pixels for ${w}x$h"))
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // bg color, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { f =>
      // GCE: no disposal, 10cs delay — content the decoder must skip
      out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 10, 0, 0, 0))
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8) // LZW min code size: full 256-literal alphabet
      val data = lzwEncode(8, f)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ---------- real image decode: baseline JPEG (ITU-T T.81) ----------

  /** Zigzag scan order: position k in the entropy stream → natural
    * (row-major) index in the 8×8 block (T.81 Figure 5). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Cu·cos((2x+1)uπ/16) with Cu = 1/√2 for u = 0 — the shared separable
    * basis for FDCT (encoder) and IDCT (decoder). Doubles are fine for
    * features: the values below round to the same ints on every JVM (the
    * basis entries are exactly-rounded doubles and the accumulation
    * error is ~1e-13 against a ±0.5 rounding margin). */
  private val DctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table (T.81 Annex C): BITS (count of codes per
    * length 1–16) + HUFFVAL (symbols in code order) expand to both the
    * decoder's mincode/maxcode/valptr arrays (F.15) and the encoder's
    * per-symbol (code, length) map. maxcode(l) = firstUnassigned − 1
    * works for empty lengths too: any longer code's l-bit prefix is ≥
    * the first unassigned code at l, so the `code > maxcode` descent
    * never stops on an empty level. */
  private final class HuffTab(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    val huffval: Array[Int] = vals
    val bitsArr: Array[Int] = bits
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k; mincode(l) = code
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code; lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        maxcode(l) = code - 1
        code <<= 1; l += 1
      }
    }
  }

  // Annex K standard luminance tables — used for every component in the
  // fixture encoder (baseline permits one table pair for all scans) and
  // as public-spec constants, not tuned data.
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array.tabulate(12)(identity)
  private val StdAcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Flat quantization table with q(0,0) = 8: the DC step that makes
    * block-constant images round-trip EXACTLY (FDCT of a constant block
    * v is DC = 8·(v−128), so quantize-by-8 stores v−128 and the IDCT
    * lands back on v before rounding can move it) — the closed form the
    * x_multimodal_jpeg_phash oracle replays. */
  val FlatQuant8: Array[Int] = Array.fill(64)(8)

  /** Entropy-segment bit reader: MSB-first, 0xFF00 byte unstuffing; any
    * real marker (RST, EOI, garbage) stops the stream — `eof` poisons
    * every later read so a truncated stream fails the block count check
    * instead of fabricating coefficients. */
  private final class JpegBits(b: Array[Byte]) {
    var pos = 0
    private var acc = 0
    private var cnt = 0
    var eof = false
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) { eof = true; return 0 }
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { eof = true; return 0 }
          if ((b(pos) & 0xff) == 0) pos += 1 // stuffed data 0xFF
          else { eof = true; pos -= 1; return 0 } // a marker: stop
        }
        acc = v; cnt = 8
      }
      cnt -= 1
      (acc >>> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker (n cycles 0–7). */
    def restart(n: Int): Boolean = {
      cnt = 0
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) == (0xd0 + n)) { pos += 2; eof = false; true }
      else false
    }
  }

  private def jpegDecodeSym(t: HuffTab, r: JpegBits): Int = {
    var code = r.bit(); var l = 1
    while (code > t.maxcode(l)) {
      code = (code << 1) | r.bit(); l += 1
      if (l > 16 || r.eof) return -1
    }
    t.huffval(t.valptr(l) + code - t.mincode(l))
  }

  /** T.81 F.12 EXTEND: an s-bit magnitude v to its signed value. */
  private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Separable 8×8 IDCT (shared basis) of DEQUANTIZED natural-order
    * coefficients to clamped 0–255 pixels — the one arithmetic both the
    * baseline scan and the progressive finish must share bit-for-bit
    * (the lossless-fixture oracle depends on it). */
  private def jpegIdctBlock(coef: Array[Int], pix: Array[Int], tmp: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += DctBasis(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var v2 = 0
        while (v2 < 8) { acc += DctBasis(v2)(y) * tmp(v2 * 8 + x); v2 += 1 }
        val p = math.rint(acc / 4.0 + 128.0).toInt
        pix(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** JPEG decode to the luma plane — pure JVM.
    * Baseline envelope: SOF0/SOF1, 8-bit, one interleaved scan, ≤ 4
    * components with sampling factors 1–2 where the FIRST component (Y)
    * carries the maxima (every camera/libjpeg layout: 4:4:4, 4:2:2,
    * 4:2:0 gray or YCbCr). Chroma blocks are entropy-decoded to keep the
    * bitstream in sync, then discarded — features need luma only, and in
    * JFIF the Y channel IS the grayscale image (no color convert
    * needed). DRI/RSTn restart intervals reset the DC predictors per
    * T.81 F.2.1.3.1.
    * Progressive envelope (SOF2): gray OR color, spectral-selection
    * scans with Ah=Al=0 — per-component coefficient grids accumulate
    * across scans (DC scans interleaved in MCU order or
    * single-component; AC band scans single-component per T.81, with
    * EOB-run semantics per G.1.2.2) and the LUMA grid IDCTs at EOI;
    * whatever spectra the scans covered render, exactly as progressive
    * display would, and chroma scans are decoded for bitstream sync like
    * the baseline path. Successive approximation, arithmetic coding,
    * 12-bit, restart-in-progressive, and point transforms are out of
    * envelope → None; truncated or desynced entropy data → None; NEVER
    * throws (fuzzed in MultimodalSpec). */
  private def decodeJpeg(b: Array[Byte]): Option[Raster] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[HuffTab](4); val acTabs = new Array[HuffTab](4)
    var w = 0; var h = 0; var nc = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var restartInterval = 0
    var sofSeen = false
    // progressive (SOF2) state: per-COMPONENT per-block DEQUANTIZED
    // coefficients accumulated across scans, each component on its
    // MCU-padded block grid (pbx × pby) so an interleaved DC scan's
    // padding blocks have somewhere to land; AC scans walk the unpadded
    // grid (nbx × nby) per T.81's non-interleaved rule
    var progressive = false
    var coefsC: Array[Array[Array[Int]]] = null
    var pbx: Array[Int] = null; var pby: Array[Int] = null
    var nbx: Array[Int] = null; var nby: Array[Int] = null
    var progScans = 0 // a zero-scan SOF2 stream must NOT render (all-gray lie)
    var iNext = -1L // set by a progressive scan: resume AFTER its entropy data
    // EOI (or end of buffer) on a progressive stream with at least one
    // decoded scan: the accumulated LUMA coefficients ARE the image
    // (partial spectra render coarse, exactly as progressive display
    // would; chroma is decoded for bitstream sync and feature parity
    // with the baseline path, which also renders luma only)
    def finishProgressive(): Option[Raster] = {
      if (!progressive || coefsC == null || progScans == 0) return None
      val pix = new Array[Int](64)
      val tmp = new Array[Double](64)
      val gray = new Array[Int](w * h)
      // component 0 carries max sampling, so its UNPADDED grid covers
      // exactly ceil(w/8) × ceil(h/8)
      var by = 0
      while (by < nby(0)) {
        var bx = 0
        while (bx < nbx(0)) {
          jpegIdctBlock(coefsC(0)(by * pbx(0) + bx), pix, tmp)
          val ox = bx * 8; val oy = by * 8
          var y = 0
          while (y < 8 && oy + y < h) {
            var x = 0
            while (x < 8 && ox + x < w) {
              gray((oy + y) * w + ox + x) = pix(y * 8 + x)
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      Some(Raster(w, h, gray))
    }
    var i = 2L
    while (i + 3 < b.length) {
      if ((b(i.toInt) & 0xff) != 0xff) return None
      val marker = b(i.toInt + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
      else if (marker == 0xd9) return finishProgressive()
      else {
        val o = i.toInt
        val len = beShort(b, o + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        marker match {
          case 0xdb => // DQT: one or more (PqTq, 64 entries) tables
            var p = o + 4
            val end = o + 2 + len
            while (p < end) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > end) return None // 8-bit only
              var k = 0
              while (k < 64) { quant(tq)(k) = b(p + 1 + k) & 0xff; k += 1 }
              quantSeen(tq) = true
              p += 65
            }
          case 0xc4 => // DHT: one or more (TcTh, bits, vals) tables
            var p = o + 4
            val end = o + 2 + len
            while (p < end) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val bits = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
              val n = bits.sum
              if (n > 256 || p + 17 + n > end) return None
              val vals = Array.tabulate(n)(j => b(p + 17 + j) & 0xff)
              val tab = new HuffTab(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline/extended; SOF2 progressive
            if (sofSeen || len < 8) return None
            if ((b(o + 4) & 0xff) != 8) return None // 8-bit precision
            h = beShort(b, o + 5); w = beShort(b, o + 7)
            nc = b(o + 9) & 0xff
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
                w.toLong * h > MaxPixels || nc < 1 || nc > 4 ||
                len < 8 + 3 * nc) return None
            compId = new Array[Int](nc); compH = new Array[Int](nc)
            compV = new Array[Int](nc); compQ = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = b(o + 10 + 3 * c) & 0xff
              val hv = b(o + 11 + 3 * c) & 0xff
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              compQ(c) = b(o + 12 + 3 * c) & 0xff
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                  compQ(c) > 3) return None
              c += 1
            }
            if (marker == 0xc2) {
              // progressive envelope: spectral selection only, gray OR
              // color (interleaved DC scan + per-component AC band
              // scans); successive approximation falls to the flagged
              // stand-in. Like baseline, the FIRST component must carry
              // the max sampling factors (the Y-first JFIF layout).
              val hm = compH.max; val vm = compV.max
              if (compH(0) != hm || compV(0) != vm) return None
              val mX = (w + 8 * hm - 1) / (8 * hm)
              val mY = (h + 8 * vm - 1) / (8 * vm)
              pbx = Array.tabulate(nc)(c => mX * compH(c))
              pby = Array.tabulate(nc)(c => mY * compV(c))
              nbx = Array.tabulate(nc)(c => ((w * compH(c) + hm - 1) / hm + 7) / 8)
              nby = Array.tabulate(nc)(c => ((h * compV(c) + vm - 1) / vm + 7) / 8)
              val totalBlocks = (0 until nc).map(c => pbx(c).toLong * pby(c)).sum
              if (totalBlocks * 64 > 16L * MaxPixels) return None
              coefsC = Array.tabulate(nc)(c => Array.ofDim[Int](pbx(c) * pby(c), 64))
              progressive = true
            }
            sofSeen = true
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // lossless/arithmetic/hierarchical: out of envelope
          case 0xdd => // DRI
            if (len < 4) return None
            restartInterval = beShort(b, o + 4)
          case 0xda if progressive => // progressive scan: accumulate coefficients
            // envelope: Ah=Al=0 (no successive approximation), no
            // restart intervals — anything else falls to the flagged
            // stand-in. DC scans (Ss=Se=0) code like baseline DC and may
            // be INTERLEAVED over all components (MCU order) or
            // single-component; AC band scans are single-component per
            // T.81 and code [Ss..Se] with ZRL + EOBn runs (G.1.2.2).
            if (restartInterval > 0) return None
            val ns = b(o + 4) & 0xff
            if (len < 6 + 2 * ns || (ns != 1 && ns != nc)) return None
            val ss = b(o + 4 + 2 * ns + 1) & 0xff
            val se = b(o + 4 + 2 * ns + 2) & 0xff
            if ((b(o + 4 + 2 * ns + 3) & 0xff) != 0) return None // Ah/Al
            val isDc = ss == 0
            if (isDc && se != 0) return None // combined DC+AC scan is illegal in SOF2
            if (!isDc && (se < ss || se > 63)) return None
            if (!isDc && ns != 1) return None // AC scans are non-interleaved
            // resolve the scan's components against SOF order; an
            // interleaved scan must list ALL components in SOF order
            val scanComp = new Array[Int](ns)
            val scanTab = new Array[HuffTab](ns)
            var sc = 0
            while (sc < ns) {
              val cid = b(o + 5 + 2 * sc) & 0xff
              val idx = compId.indexOf(cid)
              if (idx < 0 || (ns == nc && idx != sc)) return None
              val td = (b(o + 6 + 2 * sc) & 0xff) >> 4
              val ta = b(o + 6 + 2 * sc) & 0x0f
              if ((if (isDc) td else ta) > 3) return None
              val tab = if (isDc) dcTabs(td) else acTabs(ta)
              if (tab == null || !quantSeen(compQ(idx))) return None
              scanComp(sc) = idx; scanTab(sc) = tab
              sc += 1
            }
            val r = new JpegBits(java.util.Arrays.copyOfRange(b, o + 2 + len, b.length))
            if (isDc && ns > 1) {
              // interleaved DC scan: MCU walk over every component's
              // padded grid, per-component predictors
              val hm = compH.max; val vm = compV.max
              val mcusX = (w + 8 * hm - 1) / (8 * hm)
              val mcusY = (h + 8 * vm - 1) / (8 * vm)
              val dcPred = new Array[Int](nc)
              var mcu = 0
              val nMcus = mcusX * mcusY
              while (mcu < nMcus) {
                val mx = mcu % mcusX; val my = mcu / mcusX
                var c = 0
                while (c < ns) {
                  val ci = scanComp(c)
                  val q = quant(compQ(ci))
                  var byy = 0
                  while (byy < compV(ci)) {
                    var bxx = 0
                    while (bxx < compH(ci)) {
                      val s = jpegDecodeSym(scanTab(c), r)
                      if (s < 0 || s > 11) return None
                      dcPred(ci) += jpegExtend(r.bits(s), s)
                      coefsC(ci)((my * compV(ci) + byy) * pbx(ci) +
                        (mx * compH(ci) + bxx))(0) = dcPred(ci) * q(0)
                      bxx += 1
                    }
                    byy += 1
                  }
                  c += 1
                }
                if (r.eof) return None
                mcu += 1
              }
              progScans += 1
            } else {
              // single-component scan (DC or an AC band): row-major walk
              // over the component's UNPADDED grid
              val ci = scanComp(0)
              val q = quant(compQ(ci))
              val tab = scanTab(0)
              var dcPred = 0
              var eobrun = 0
              var byy = 0
              while (byy < nby(ci)) {
                var bxx = 0
                while (bxx < nbx(ci)) {
                  val cf = coefsC(ci)(byy * pbx(ci) + bxx)
                  if (isDc) {
                    val s = jpegDecodeSym(tab, r)
                    if (s < 0 || s > 11) return None
                    dcPred += jpegExtend(r.bits(s), s)
                    cf(0) = dcPred * q(0)
                  } else if (eobrun > 0) {
                    eobrun -= 1 // this block's band is all zero
                  } else {
                    var k = ss
                    var bandDone = false
                    while (k <= se && !bandDone) {
                      val rs = jpegDecodeSym(tab, r)
                      if (rs < 0) return None
                      val run = rs >> 4; val size = rs & 0x0f
                      if (size == 0) {
                        if (run == 15) k += 16 // ZRL: 16 zeros inside the band
                        else {
                          // EOBn: this band ends; 2^run - 1 + ext more blocks' bands are zero
                          eobrun = (1 << run) - 1 + (if (run > 0) r.bits(run) else 0)
                          bandDone = true
                        }
                      } else {
                        k += run
                        if (k > se) return None
                        cf(ZigZag(k)) = jpegExtend(r.bits(size), size) * q(k)
                        k += 1
                      }
                    }
                  }
                  if (r.eof) return None
                  bxx += 1
                }
                byy += 1
              }
              progScans += 1
            }
            // resume the marker walk at the next true marker after this
            // scan's entropy data (entropy bytes stuff 0xFF as 0xFF00, so
            // 0xFF followed by a non-stuffing, non-RST byte IS a marker)
            var p = (o + 2 + len).toLong
            while (iNext < 0 && p + 1 < b.length) {
              if ((b(p.toInt) & 0xff) == 0xff) {
                val m2 = b(p.toInt + 1) & 0xff
                if (m2 != 0 && !(m2 >= 0xd0 && m2 <= 0xd7)) iNext = p
              }
              p += 1
            }
            if (iNext < 0) return None

          case 0xda => // SOS: decode the interleaved scan and finish
            if (!sofSeen) return None
            val ns = b(o + 4) & 0xff
            if (ns != nc || len < 6 + 2 * ns) return None
            val scanDc = new Array[Int](nc); val scanAc = new Array[Int](nc)
            var c = 0
            while (c < ns) {
              val cid = b(o + 5 + 2 * c) & 0xff
              val idx = compId.indexOf(cid)
              if (idx < 0) return None
              scanDc(idx) = (b(o + 6 + 2 * c) & 0xff) >> 4
              scanAc(idx) = b(o + 6 + 2 * c) & 0x0f
              // Td/Ta are 4-bit (0..15) but only 0..3 are valid slots —
              // reject here so the table-null check below can't index out
              if (scanDc(idx) > 3 || scanAc(idx) > 3) return None
              c += 1
            }
            c = 0
            while (c < nc) {
              if (!quantSeen(compQ(c)) || dcTabs(scanDc(c)) == null ||
                  acTabs(scanAc(c)) == null) return None
              c += 1
            }
            val hmax = compH.max; val vmax = compV.max
            if (compH(0) != hmax || compV(0) != vmax) return None // Y first
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            val ybw = mcusX * compH(0); val ybh = mcusY * compV(0)
            if (ybw.toLong * ybh * 64 > 4L * MaxPixels) return None
            val yPlane = new Array[Int](ybw * 8 * ybh * 8)
            val coef = new Array[Int](64)
            val pix = new Array[Int](64)
            val tmp = new Array[Double](64)
            val dcPred = new Array[Int](nc)
            val r = new JpegBits(java.util.Arrays.copyOfRange(b, o + 2 + len, b.length))
            var mcu = 0; var rstN = 0
            val nMcus = mcusX * mcusY
            while (mcu < nMcus) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                if (!r.restart(rstN)) return None
                rstN = (rstN + 1) & 7
                java.util.Arrays.fill(dcPred, 0)
              }
              val mx = mcu % mcusX; val my = mcu / mcusX
              c = 0
              while (c < nc) {
                val q = quant(compQ(c))
                var by = 0
                while (by < compV(c)) {
                  var bx = 0
                  while (bx < compH(c)) {
                    // entropy-decode one block (T.81 F.2.2)
                    java.util.Arrays.fill(coef, 0)
                    val s = jpegDecodeSym(dcTabs(scanDc(c)), r)
                    if (s < 0 || s > 11) return None
                    dcPred(c) += jpegExtend(r.bits(s), s)
                    coef(0) = dcPred(c) * q(0)
                    var k = 1
                    while (k < 64) {
                      val rs = jpegDecodeSym(acTabs(scanAc(c)), r)
                      if (rs < 0) return None
                      val run = rs >> 4; val size = rs & 0x0f
                      if (size == 0) {
                        if (run == 15) k += 16 else k = 64 // ZRL / EOB
                      } else {
                        k += run
                        if (k > 63) return None
                        coef(ZigZag(k)) = jpegExtend(r.bits(size), size) * q(k)
                        k += 1
                      }
                    }
                    if (r.eof) return None
                    if (c == 0) {
                      // IDCT (shared helper, identical to the progressive
                      // finish) and place the block
                      jpegIdctBlock(coef, pix, tmp)
                      val ox = (mx * compH(0) + bx) * 8; val oy = (my * compV(0) + by) * 8
                      var yy = 0
                      while (yy < 8) {
                        System.arraycopy(pix, yy * 8, yPlane, (oy + yy) * (ybw * 8) + ox, 8)
                        yy += 1
                      }
                    }
                    bx += 1
                  }
                  by += 1
                }
                c += 1
              }
              mcu += 1
            }
            // crop the padded block grid to the true dimensions
            val gray = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              System.arraycopy(yPlane, y * (ybw * 8), gray, y * w, w)
              y += 1
            }
            return Some(Raster(w, h, gray))
          case _ => () // APPn / COM / other: skip by length
        }
        if (iNext >= 0) { i = iNext; iNext = -1L } // progressive scan consumed
        else i += 2L + len
      }
    }
    // a trailing EOI sits in the final 2 bytes, past the `i + 3` guard —
    // a progressive stream that decoded scans still finishes here
    finishProgressive()
  }

  /** Bit writer for the encoder: MSB-first with 0xFF→0xFF00 stuffing;
    * flush pads to a byte boundary with 1-bits (T.81 F.1.2.3). */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        n -= 8
        val v = ((acc >>> n) & 0xff).toInt
        out.write(v)
        if (v == 0xff) out.write(0)
      }
    }
    def flush(): Unit = { val pad = (8 - n % 8) % 8; if (pad > 0) put((1 << pad) - 1, pad) }
  }

  private def jpegMagnitude(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Load an 8×8 block (edge-replicating past the plane bounds), FDCT
    * with the shared basis, and quantize into zigzag-order `coef` — the
    * one forward arithmetic both the baseline and progressive encoders
    * share, mirroring [[jpegIdctBlock]] on the decode side. */
  private def jpegFdctQuantBlock(plane: Array[Int], pw: Int, ph: Int, ox: Int, oy: Int,
                                 quantTab: Array[Int], block: Array[Double],
                                 tmp: Array[Double], coef: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(oy + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(ox + x, pw - 1)
        block(y * 8 + x) = plane(sy * pw + sx) - 128.0
        x += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var y2 = 0
      while (y2 < 8) {
        var acc = 0.0; var x2 = 0
        while (x2 < 8) { acc += DctBasis(u)(x2) * block(y2 * 8 + x2); x2 += 1 }
        tmp(y2 * 8 + u) = acc
        y2 += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var acc = 0.0; var y3 = 0
        while (y3 < 8) { acc += DctBasis(v)(y3) * tmp(y3 * 8 + u2); y3 += 1 }
        block(v * 8 + u2) = acc / 4.0 // block is free after pass 1
        u2 += 1
      }
      v += 1
    }
    var k = 0
    while (k < 64) {
      coef(k) = math.rint(block(ZigZag(k)) / quantTab(k)).toInt
      k += 1
    }
  }

  /** A component for [[encodeJpeg]]: sampling factors and its plane at
    * the subsampled resolution ceil(w·h_c/h_max) × ceil(h·v_c/v_max). */
  case class JpegComp(h: Int, v: Int, plane: Array[Int], pw: Int, ph: Int)

  /** Baseline JPEG encoder — the FIXTURE side of the JPEG-decode
    * contract (the [[encodeGrayPng]]/[[encodeGif]] pattern: specs and
    * the x_multimodal_jpeg_phash oracle build payloads with it;
    * [[decodeRaster]] must invert them through the real marker walk,
    * Huffman, dequant and IDCT). Interleaved single scan, Annex K
    * standard Huffman tables (pair 0 for every component), one quant
    * table, optional DRI/RSTn restart intervals, edge-replicated
    * partial-MCU padding. With [[FlatQuant8]] and block-constant pixels
    * the encode is LOSSLESS (see FlatQuant8's doc), which is what makes
    * a SQL oracle over encoded payloads possible at all. */
  def encodeJpeg(w: Int, h: Int, comps: Seq[JpegComp], quantTab: Array[Int] = FlatQuant8,
                 restartInterval: Int = 0): Array[Byte] = {
    require(comps.nonEmpty && comps.size <= 4, s"${comps.size} components")
    require(quantTab.length == 64, "quant table must have 64 entries")
    comps.foreach(c => require(c.plane.length == c.pw * c.ph,
      s"${c.plane.length} pixels for ${c.pw}x${c.ph}"))
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    require(comps.head.h == hmax && comps.head.v == vmax, "first component must carry max sampling")
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); be16(2 + 65); out.write(0x00) // DQT table 0, 8-bit
    ZigZag.indices.foreach(k => out.write(quantTab(k)))
    marker(0xc0); be16(8 + 3 * comps.size); out.write(8); be16(h); be16(w)
    out.write(comps.size)
    comps.zipWithIndex.foreach { case (c, idx) =>
      out.write(idx + 1); out.write((c.h << 4) | c.v); out.write(0)
    }
    val dcTab = new HuffTab(StdDcBits, StdDcVals)
    val acTab = new HuffTab(StdAcBits, StdAcVals)
    def writeDht(tc: Int, t: HuffTab): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + t.huffval.length); out.write(tc << 4)
      t.bitsArr.foreach(out.write); t.huffval.foreach(out.write)
    }
    writeDht(0, dcTab); writeDht(1, acTab)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(6 + 2 * comps.size); out.write(comps.size)
    comps.indices.foreach { idx => out.write(idx + 1); out.write(0x00) }
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new JpegBitWriter(out)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val dcPred = new Array[Int](comps.size)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var rstN = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush(); marker(0xd0 + rstN); rstN = (rstN + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.size) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            jpegFdctQuantBlock(c.plane, c.pw, c.ph, ox, oy, quantTab, block, tmp, coef)
            // entropy-encode: DC diff + run-length ACs
            val diff = coef(0) - dcPred(ci); dcPred(ci) = coef(0)
            val s = jpegMagnitude(diff)
            bw.put(dcTab.codeOf(s), dcTab.lenOf(s))
            if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            var run = 0
            var k = 1
            while (k < 64) {
              if (coef(k) == 0) run += 1
              else {
                while (run > 15) { bw.put(acTab.codeOf(0xf0), acTab.lenOf(0xf0)); run -= 16 }
                val sz = jpegMagnitude(coef(k))
                val sym = (run << 4) | sz
                bw.put(acTab.codeOf(sym), acTab.lenOf(sym))
                bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.put(acTab.codeOf(0x00), acTab.lenOf(0x00)) // EOB
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale baseline JPEG (single component). */
  def encodeGrayJpeg(w: Int, h: Int, gray: Array[Int], quantTab: Array[Int] = FlatQuant8,
                     restartInterval: Int = 0): Array[Byte] =
    encodeJpeg(w, h, Seq(JpegComp(1, 1, gray, w, h)), quantTab, restartInterval)

  /** Grayscale PROGRESSIVE JPEG (SOF2, spectral selection only): one DC
    * scan (Ss=Se=0) followed by AC scans over the `bands` partition of
    * the 1–63 spectrum, all with Ah=Al=0. Every band terminates with a
    * plain EOB (EOB-run length 1), so the Annex K AC table suffices.
    * The coefficients are IDENTICAL to [[encodeGrayJpeg]]'s (shared
    * [[jpegFdctQuantBlock]]) — only the scan organization differs — so
    * the FlatQuant8 losslessness argument carries over unchanged, which
    * is what lets the progressive decode path share the baseline's
    * pixel-formula oracle. */
  def encodeGrayProgressiveJpeg(w: Int, h: Int, gray: Array[Int],
                                quantTab: Array[Int] = FlatQuant8,
                                bands: Seq[(Int, Int)] = Seq((1, 5), (6, 63))): Array[Byte] =
    encodeProgressiveJpeg(w, h, Seq(JpegComp(1, 1, gray, w, h)), quantTab, bands)

  /** PROGRESSIVE JPEG encoder (SOF2, spectral selection only), gray OR
    * color: one DC scan — INTERLEAVED over all components in MCU order
    * when there is more than one (the standard progressive layout) —
    * followed by per-component AC scans over the `bands` partition of
    * the 1–63 spectrum, each walking the component's own (unpadded)
    * block grid non-interleaved as T.81 requires of AC scans. All scans
    * Ah=Al=0; every band terminates with a plain EOB (EOB-run length 1),
    * so the Annex K AC table suffices. Coefficients are IDENTICAL to
    * [[encodeJpeg]]'s (shared [[jpegFdctQuantBlock]]) — only the scan
    * organization differs — so the FlatQuant8 losslessness argument
    * carries over unchanged, which is what lets the progressive decode
    * path (gray AND color) share the baseline's pixel-formula oracle. */
  def encodeProgressiveJpeg(w: Int, h: Int, comps: Seq[JpegComp],
                            quantTab: Array[Int] = FlatQuant8,
                            bands: Seq[(Int, Int)] = Seq((1, 5), (6, 63))): Array[Byte] = {
    require(comps.nonEmpty && comps.size <= 4, s"${comps.size} components")
    comps.foreach(c => require(c.plane.length == c.pw * c.ph,
      s"${c.plane.length} pixels for ${c.pw}x${c.ph}"))
    require(quantTab.length == 64, "quant table must have 64 entries")
    require(bands.nonEmpty && bands.head._1 == 1 && bands.last._2 == 63 &&
      bands.forall { case (s, e) => s >= 1 && s <= e && e <= 63 } &&
      bands.iterator.sliding(2).withPartial(false)
        .forall(p => p(1)._1 == p(0)._2 + 1),
      s"bands must partition 1..63 in order: $bands")
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    require(comps.head.h == hmax && comps.head.v == vmax,
      "first component must carry max sampling")
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); be16(2 + 65); out.write(0x00)
    ZigZag.indices.foreach(k => out.write(quantTab(k)))
    marker(0xc2); be16(8 + 3 * comps.size); out.write(8); be16(h); be16(w) // SOF2
    out.write(comps.size)
    comps.zipWithIndex.foreach { case (c, idx) =>
      out.write(idx + 1); out.write((c.h << 4) | c.v); out.write(0)
    }
    val dcTab = new HuffTab(StdDcBits, StdDcVals)
    val acTab = new HuffTab(StdAcBits, StdAcVals)
    def writeDht(tc: Int, t: HuffTab): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + t.huffval.length); out.write(tc << 4)
      t.bitsArr.foreach(out.write); t.huffval.foreach(out.write)
    }
    writeDht(0, dcTab); writeDht(1, acTab)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // every component's coefficients up front, on the MCU-PADDED grid
    // (pbx × pby blocks; padding blocks edge-replicate via the fdct's
    // clamp) — the interleaved DC scan walks the padding too, exactly as
    // a baseline interleaved scan would
    val pbx = comps.map(c => mcusX * c.h); val pby = comps.map(c => mcusY * c.v)
    val all = comps.indices.map(ci => Array.ofDim[Int](pbx(ci) * pby(ci), 64)).toArray
    val block = new Array[Double](64); val tmp = new Array[Double](64)
    comps.indices.foreach { ci =>
      val c = comps(ci)
      var blk = 0
      while (blk < all(ci).length) {
        jpegFdctQuantBlock(c.plane, c.pw, c.ph, (blk % pbx(ci)) * 8,
          (blk / pbx(ci)) * 8, quantTab, block, tmp, all(ci)(blk))
        blk += 1
      }
    }
    def sos(compIdx: Seq[Int], ss: Int, se: Int): Unit = {
      marker(0xda); be16(6 + 2 * compIdx.size); out.write(compIdx.size)
      compIdx.foreach { idx => out.write(idx + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write(0x00)
    }
    def putDc(bw: JpegBitWriter, diff: Int): Unit = {
      val s = jpegMagnitude(diff)
      bw.put(dcTab.codeOf(s), dcTab.lenOf(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    // scan 1: DC — interleaved in MCU order when multi-component,
    // the component's own grid when single (a 1-component scan is
    // non-interleaved by definition, T.81 A.2)
    if (comps.size == 1) {
      sos(Seq(0), 0, 0)
      val bw = new JpegBitWriter(out)
      var dcPred = 0
      var blk = 0
      while (blk < all(0).length) {
        val dc = all(0)(blk)(0); putDc(bw, dc - dcPred); dcPred = dc
        blk += 1
      }
      bw.flush()
    } else {
      sos(comps.indices, 0, 0)
      val bw = new JpegBitWriter(out)
      val dcPred = new Array[Int](comps.size)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < comps.size) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val blk = (my * c.v + by) * pbx(ci) + (mx * c.h + bx)
              val dc = all(ci)(blk)(0)
              putDc(bw, dc - dcPred(ci)); dcPred(ci) = dc
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bw.flush()
    }
    // AC band scans: per band, per component, non-interleaved over the
    // component's UNPADDED block grid (ceil(comp_w/8) × ceil(comp_h/8))
    bands.foreach { case (ss, se) =>
      comps.indices.foreach { ci =>
        val c = comps(ci)
        val nbx = (ceilDiv(w * c.h, hmax) + 7) / 8
        val nby = (ceilDiv(h * c.v, vmax) + 7) / 8
        sos(Seq(ci), ss, se)
        val bw = new JpegBitWriter(out)
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            val cf = all(ci)(by * pbx(ci) + bx)
            var run = 0
            var k = ss
            while (k <= se) {
              if (cf(k) == 0) run += 1
              else {
                while (run > 15) { bw.put(acTab.codeOf(0xf0), acTab.lenOf(0xf0)); run -= 16 }
                val sz = jpegMagnitude(cf(k))
                bw.put(acTab.codeOf((run << 4) | sz), acTab.lenOf((run << 4) | sz))
                bw.put(if (cf(k) < 0) cf(k) + (1 << sz) - 1 else cf(k), sz)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.put(acTab.codeOf(0x00), acTab.lenOf(0x00)) // EOB (run 1)
            bx += 1
          }
          by += 1
        }
        bw.flush()
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Average-hash (aHash) over a decoded raster: an 8×8 grid of box-mean
    * cells (cell(cx,cy) = mean gray over pixels with ⌊x·8/W⌋ = cx), bit
    * = cell mean strictly above the mean OF THE CELL MEANS, packed
    * row-major MSB-first into 16 lowercase hex chars. On an exactly-8×8
    * raster the cells are single pixels, so the hash has a closed form
    * any SQL engine can compute from a pixel formula — the
    * x_multimodal_phash oracle does exactly that. Means stay in exact
    * double arithmetic (integer sums, /64 is a power of two), so the
    * strict `>` threshold cannot flip on FP noise cross-engine. */
  def averageHash(r: Raster): String = {
    val sums = new Array[Long](64); val counts = new Array[Long](64)
    var y = 0
    while (y < r.height) {
      val cy = (y.toLong * 8 / r.height).toInt
      var x = 0
      while (x < r.width) {
        val c = cy * 8 + (x.toLong * 8 / r.width).toInt
        sums(c) += r.gray(y * r.width + x); counts(c) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(c => if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c))
    val thresh = means.sum / 64.0
    val sb = new StringBuilder(16)
    var k = 0
    while (k < 16) {
      var v = 0
      var j = 0
      while (j < 4) {
        if (means(k * 4 + j) > thresh) v |= 8 >> j
        j += 1
      }
      sb.append(Character.forDigit(v, 16))
      k += 1
    }
    sb.toString
  }

  /** 8 per-grid-row mean-gray features (0–1) from the same 8×8 cell grid
    * — the real embedding-ish vector the decode seam emits when pixels
    * are decodable. */
  private def rowFeatures(r: Raster): Array[Float] = {
    val sums = new Array[Long](8); val counts = new Array[Long](8)
    var y = 0
    while (y < r.height) {
      val cy = (y.toLong * 8 / r.height).toInt
      var x = 0
      while (x < r.width) { sums(cy) += r.gray(y * r.width + x); counts(cy) += 1; x += 1 }
      y += 1
    }
    Array.tabulate(8)(c =>
      if (counts(c) == 0) 0f else (sums(c).toDouble / counts(c) / 255.0).toFloat)
  }

  /** Deterministic 8×8-grid grayscale PNG encoder — the FIXTURE side of
    * the real-decode contract (specs and the x_multimodal_phash query
    * build payloads with it; [[decodeRaster]] must invert them). Emits
    * 8-bit color-type-0 PNG with scanline filters cycling None/Sub/Up so
    * the decoder's unfilter path is actually exercised, zlib-deflated
    * IDAT, correct CRCs. `phase` rotates the filter cycle: the same
    * pixels encode to a DIFFERENT byte stream per phase — the fixture
    * for pixel-level (not byte-level) dedup semantics. */
  def encodeGrayPng(w: Int, h: Int, gray: Array[Int], phase: Int = 0): Array[Byte] = {
    require(gray.length == w * h, s"${gray.length} pixels for ${w}x$h")
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      val f = (y + phase) % 3
      raw(y * (w + 1)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = gray(y * w + x)
        val v = f match {
          case 0 => cur
          case 1 => cur - (if (x > 0) gray(y * w + x - 1) else 0)
          case _ => cur - (if (y > 0) gray((y - 1) * w + x) else 0)
        }
        raw(y * (w + 1) + 1 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length), 0, 4)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", Array[Byte](
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      8, 0, 0, 0, 0)) // 8-bit, grayscale, deflate, adaptive, non-interlaced
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------- real audio decode (PCM WAV) ----------

  /** Decoded audio: mono samples (multi-channel mixes by floor-average),
    * 16-bit range regardless of source depth. */
  case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Decode a PCM WAV payload to mono samples — pure JVM, the RIFF chunk
    * walk from [[parseHeader]] plus the sample read: 8-bit (unsigned,
    * re-centered) or 16-bit LE, 1–8 channels floor-averaged to mono.
    * Compressed codecs (audioFormat ≠ 1), truncated data chunks, or
    * sample counts past the [[MaxPixels]]-scale guard → None, never a
    * throw. */
  def decodePcm(b: Array[Byte]): Option[PcmAudio] = try {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var i = 12L
    var fmtOk = false; var audioFmt = 0; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1L; var dataLen = 0L
    while (i + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val o = i.toInt
      val sz = leInt(b, o + 4)
      if (sz < 0) return None
      val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
      val isData = b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a'
      if (isFmt) {
        if (i + 8 + 16 > b.length || sz < 16) return None
        audioFmt = leShort(b, o + 8); channels = leShort(b, o + 10)
        rate = leInt(b, o + 12); bits = leShort(b, o + 22)
        fmtOk = true
      } else if (isData) {
        if (i + 8 + sz > b.length) return None // truncated data chunk
        dataOff = i + 8; dataLen = sz.toLong
      }
      i += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    if (audioFmt != 1 || rate <= 0 || channels < 1 || channels > 8 ||
        (bits != 8 && bits != 16)) return None
    val frameBytes = (bits / 8) * channels
    val n = (dataLen / frameBytes).toInt
    if (n <= 0 || n > MaxPixels) return None
    val samples = new Array[Int](n)
    var k = 0
    while (k < n) {
      var sum = 0
      var c = 0
      while (c < channels) {
        val o = (dataOff + k.toLong * frameBytes + c * (bits / 8)).toInt
        val v =
          if (bits == 16) (((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)).toShort.toInt
          else ((b(o) & 0xff) - 128) << 8 // 8-bit WAV is unsigned; scale to 16-bit range
        sum += v; c += 1
      }
      samples(k) = Math.floorDiv(sum, channels)
      k += 1
    }
    Some(PcmAudio(rate, channels, samples))
  } catch { case _: Throwable => None }

  /** 16-bit LE PCM WAV encoder — the FIXTURE side of the audio-decode
    * contract (interleaved samples; a JUNK chunk sits before fmt so the
    * decoder's chunk walk is exercised, as real encoders pad there). */
  def encodeWavPcm(sampleRate: Int, channels: Int, interleaved: Array[Int]): Array[Byte] = {
    require(interleaved.length % channels == 0, "interleaved length % channels != 0")
    val dataLen = interleaved.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 12 + 24 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(4 + 12 + 24 + 8 + dataLen)
      .put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("JUNK".getBytes(java.nio.charset.StandardCharsets.US_ASCII)).putInt(4).putInt(0)
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16.toShort)
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII)).putInt(dataLen)
    interleaved.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** Audio-feature row: REAL signal statistics over decoded samples. */
  case class AudioFeatures(asset_id: String, sample_rate: Int, n_samples: Long,
                           duration_ms: Long, rms: Double, zero_crossings: Long,
                           peak: Int)

  /** Per-partition audio feature extraction: PCM-decodable payloads emit
    * duration, RMS (sqrt of mean square — exact-double path: integer
    * square sums, one division, one correctly-rounded sqrt, so the value
    * is cross-engine deterministic), sign-flip zero-crossing count, and
    * peak amplitude. Non-PCM payloads drop out (flatMap) — audio
    * features of a non-audio byte stream are noise, not data. */
  def decodeAudio(assets: DataFrame): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodePcm(if (bytes == null) Array.emptyByteArray else bytes).map { a =>
          val n = a.samples.length
          var sumSq = 0L; var zc = 0L; var peak = 0
          var i = 0
          while (i < n) {
            val s = a.samples(i)
            sumSq += s.toLong * s
            if (i > 0 && s.toLong * a.samples(i - 1) < 0) zc += 1
            val as = math.abs(s); if (as > peak) peak = as
            i += 1
          }
          AudioFeatures(id, a.sampleRate, n.toLong,
            Math.floorDiv(n.toLong * 1000, a.sampleRate),
            math.sqrt(sumSq.toDouble / n), zc, peak)
        }
      }
  }

  /** Extracted-feature row produced by the decode stage: REAL header
    * metadata (format/width/height/sample_rate from [[parseHeader]]) and,
    * for decodable rasters, REAL perceptual features ([[averageHash]] +
    * grid-row means over decoded pixels). */
  /** `decoded` is the honesty bit: true ⇔ phash/feat came from REAL
    * decoded pixels; false ⇔ the payload sat outside the pure-JVM decode
    * envelope (color/successive-approximation progressive JPEG,
    * arithmetic coding, arbitrary bytes) and the md5-derived stand-in
    * filled in. Downstream perceptual dedup should filter on it
    * (stand-in hashes only ever match byte-identical payloads). */
  case class AssetFeatures(asset_id: String, n_bytes: Long, format: String,
                           width: Option[Int], height: Option[Int],
                           sample_rate: Option[Int], phash: String, feat: Array[Float],
                           decoded: Boolean)

  /** Per-partition decode stage. Header metadata is parsed for real from
    * the payload bytes. phash/feat are REAL perceptual features when the
    * payload decodes ([[decodeRaster]]: PNG via Inflater + unfilter, BMP
    * raw rows, GIF via LZW + palette, baseline JPEG via Huffman +
    * dequant + IDCT; grayscale progressive JPEG via multi-scan spectral
    * assembly — average-hash and 8 grid-row means over actual pixels);
    * payloads outside the pure-JVM-decodable envelope (color or
    * successive-approximation progressive, arithmetic coding, arbitrary
    * bytes) fall back to the md5-derived stand-in — deterministic,
    * FLAGGED `decoded = false`, and the seam where a full codec binds
    * (one init per partition, same mapPartitions batch shape). */
  def decode(assets: DataFrame): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real codec (one ctx/partition)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val hm = parseHeader(b)
          md.reset()
          val h = md.digest(b).map("%02x".format(_)).mkString
          val raster = decodeRaster(b)
          val phash = raster.map(averageHash).getOrElse(h.substring(0, 16))
          val feat = raster.map(rowFeatures).getOrElse(
            (0 until 8).map { i =>
              java.lang.Long.parseLong(h.substring(i * 4, i * 4 + 4), 16).toFloat / 65535f
            }.toArray)
          AssetFeatures(id, b.length.toLong, hm.format, hm.width, hm.height,
            hm.sample_rate, phash, feat, raster.isDefined)
        }
      }
  }

  /** Perceptual near-dup pairs over decoded image features — the
    * multimodal face of the dedup stack: byte-level dedup (content-hash
    * asset_id) misses re-encoded copies of the same pixels; this catches
    * them at the HASH level.
    *
    * Scale shape (mirrors the SimHash/MinHash ops in [[Dedup]]):
    *  1. collapse identical hashes first (groupBy phash → representative
    *     + count) — exact-dup groups ride as ONE node, so a mega-group of
    *     identical images costs one row, never an n² pair blowup;
    *  2. banded LSH on the 64-bit hash (4 bands × 4 hex nibbles):
    *     candidates share ≥1 exact band — by pigeonhole any pair within
    *     3 differing nibbles must. One shuffle, on the band key;
    *  3. exact Hamming ≤ maxHamming on candidates only — never all-pairs.
    * The contract is the LSH-recall one (shared-band AND Hamming ≤ t),
    * replayable in plain SQL — the x_dedup_image_phash oracle does. */
  def phashNearDupPairs(features: DataFrame, maxHamming: Int = 8): DataFrame = {
    val nodes = features.groupBy("phash").agg(
      min(col("asset_id")).as("rep"), count(lit(1)).as("n"))
    // two 32-bit halves: 8 hex chars always fit a BIGINT, so the parse
    // stays ANSI-safe even with bit 63 set (a full 16-char conv would
    // overflow signed 64-bit for hashes starting >= '8')
    val h = nodes
      .withColumn("h1", expr("cast(conv(substring(phash, 1, 8), 16, 10) as bigint)"))
      .withColumn("h2", expr("cast(conv(substring(phash, 9, 8), 16, 10) as bigint)"))
    val banded = h
      .withColumn("band_idx", explode(array((0 until 4).map(lit(_)): _*)))
      .withColumn("band", concat_ws(":", col("band_idx"),
        expr("substring(phash, band_idx * 4 + 1, 4)")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.phash") < col("b.phash"))
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"),
        col("a.phash").as("phash_a"), col("b.phash").as("phash_b"),
        expr("cast(bit_count(a.h1 ^ b.h1) + bit_count(a.h2 ^ b.h2) as int)").as("hamming"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .where(col("hamming") <= maxHamming)
      .distinct() // a pair may share several bands; one row per pair
  }

  case class FrameFeatures(asset_id: String, n_frames: Int, frame_idx: Int,
                           width: Int, height: Int, phash: String)

  /** REAL frame sampling: decode a multi-frame (animated) GIF payload and
    * emit per-frame perceptual features for `n` evenly spaced frames —
    * indices ⌊j·(F−1)/(n−1)⌋ for j < n over F decoded frames (first and
    * last always included; duplicates collapse when F < n). This is the
    * video-pipeline sampling shape with the decode step REAL end-to-end:
    * container walk → per-frame LZW → palette → average-hash, all inside
    * the one [[decode]]-shaped mapPartitions stage (decode once per
    * asset, emit ≤ n rows — never decode per sample point). Undecodable
    * payloads opt out, the [[frameSample]] empty-payload contract; that
    * byte-offset form remains the seam for containers without a pure-JVM
    * codec. */
  def decodeFrames(assets: DataFrame, n: Int = 2): Dataset[FrameFeatures] = {
    require(n >= 2, s"n=$n: need at least first+last")
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeGifFrames(bytes).toSeq.flatMap { frames =>
          val f = frames.size
          (0 until n).map(j => if (f == 1) 0 else (j.toLong * (f - 1) / (n - 1)).toInt)
            .distinct
            .map { fi =>
              val r = frames(fi)
              FrameFeatures(id, f, fi, r.width, r.height, averageHash(r))
            }
        }
      }
  }

  // ---------- video: MJPEG-in-AVI container (public RIFF/AVI layout) ----------

  /** Scanned AVI container metadata: `avih` fields plus the byte ranges of
    * every video chunk in `movi` (offsets, not copies — [[parseHeader]]
    * reads only the metadata; frame bytes are sliced lazily by the
    * sampler). */
  private case class AviMeta(usPerFrame: Int, width: Int, height: Int,
                             frames: Vector[(Int, Int)])

  // hostile-container guards, in the MaxDim/MaxPixels spirit: a chunk list
  // claiming 2^30 frames is an attack on the index vector, and RIFF nests
  // two levels deep in practice — unbounded LIST recursion is a stack bomb
  private val MaxAviFrames = 1 << 16
  private val MaxRiffDepth = 16

  /** One RIFF walk for both callers: chunk iteration with LIST descent
    * (depth-capped), `avih` for fps/dims, and — when `wantFrames` — the
    * `##dc`/`##db` video chunk ranges inside `LIST movi`. The frame COUNT
    * comes from walking `movi`, never from avih's dwTotalFrames: a header
    * field is a claim, the chunk list is the data (ExtSpec feeds a lying
    * header to pin this). Garbage sizes stop the walk at the malformed
    * chunk; anything hostile (over-deep nesting, absurd frame counts)
    * returns None, never a throw. */
  private def aviScan(b: Array[Byte], wantFrames: Boolean): Option[AviMeta] = try {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ')
      return None
    var usPerFrame = 0; var w = -1; var h = -1; var sawAvih = false
    val frames = Vector.newBuilder[(Int, Int)]
    var nFrames = 0; var hostile = false
    def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
      if (depth > MaxRiffDepth) { hostile = true; return }
      var i = start
      while (!hostile && i + 8 <= end) {
        val o = i.toInt
        val sz = leInt(b, o + 4)
        if (sz < 0 || i + 8 + sz > end) return // malformed size: stop here
        val isList = b(o) == 'L' && b(o + 1) == 'I' && b(o + 2) == 'S' && b(o + 3) == 'T'
        if (isList && sz >= 4) {
          val movi = b(o + 8) == 'm' && b(o + 9) == 'o' && b(o + 10) == 'v' && b(o + 11) == 'i'
          walk(i + 12, i + 8 + sz, inMovi || movi, depth + 1)
        } else if (b(o) == 'a' && b(o + 1) == 'v' && b(o + 2) == 'i' && b(o + 3) == 'h' &&
                   sz >= 40) {
          usPerFrame = leInt(b, o + 8); w = leInt(b, o + 40); h = leInt(b, o + 44)
          sawAvih = true
        } else if (inMovi && b(o) >= '0' && b(o) <= '9' && b(o + 1) >= '0' && b(o + 1) <= '9' &&
                   b(o + 2) == 'd' && (b(o + 3) == 'c' || b(o + 3) == 'b')) {
          nFrames += 1
          if (nFrames > MaxAviFrames) { hostile = true; return }
          if (wantFrames) frames += ((o + 8, sz))
        }
        i += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12L, b.length.toLong, inMovi = false, depth = 0)
    if (hostile || !sawAvih || w < 0 || w > MaxDim || h < 0 || h > MaxDim) None
    else Some(AviMeta(usPerFrame, w, h, frames.result()))
  } catch { case _: Throwable => None }

  /** MJPEG-in-AVI encoder — the FIXTURE side of the video-decode contract:
    * RIFF('AVI ') with a spec-complete `hdrl` (avih + one 'vids'/'MJPG'
    * stream: strh with scale/rate = usPerFrame/1e6, strf BITMAPINFOHEADER),
    * each grayscale frame a baseline JPEG from [[encodeGrayJpeg]] in a
    * word-aligned `00dc` chunk inside `LIST movi`, and a keyframe `idx1`
    * index. FlatQuant8 block-constant frames round-trip losslessly, so a
    * pixel formula stays oracle-checkable through the full container →
    * JPEG → IDCT path. */
  def encodeAviMjpeg(w: Int, h: Int, usPerFrame: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val jpegs = frames.map(f => encodeGrayJpeg(w, h, f))
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes(ascii))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val idx1Size = 16 * jpegs.length
    tag("RIFF"); le32(4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(usPerFrame); le32(0); le32(0); le32(0x10 /* AVIF_HASINDEX */)
    le32(jpegs.length); le32(0); le32(1); le32(0); le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // dwReserved[4]
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("MJPG"); le32(0); le16(0); le16(0); le32(0)
    le32(usPerFrame); le32(1000000) // dwScale / dwRate: rate/scale = fps
    le32(0); le32(jpegs.length); le32(jpegs.map(_.length).max); le32(0); le32(0)
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    tag("strf"); le32(40)
    le32(40); le32(w); le32(h); le16(1); le16(24); tag("MJPG"); le32(w * h * 3)
    le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    jpegs.foreach { j =>
      tag("00dc"); le32(j.length); out.write(j)
      if ((j.length & 1) == 1) out.write(0)
    }
    tag("idx1"); le32(idx1Size)
    var off = 4 // idx1 offsets are relative to the 'movi' list-type fourcc
    jpegs.foreach { j =>
      tag("00dc"); le32(0x10 /* AVIIF_KEYFRAME */); le32(off); le32(j.length)
      off += 8 + j.length + (j.length & 1)
    }
    out.toByteArray
  }

  /** Per-frame video features: REAL container walk + per-frame JPEG decode. */
  case class VideoFrames(asset_id: String, n_frames: Int, us_per_frame: Int,
                         frame_idx: Int, width: Int, height: Int, phash: String)

  /** REAL video frame sampling: walk the AVI container, sample `n` evenly
    * spaced video chunks (indices ⌊j·(F−1)/(n−1)⌋ — first and last always
    * included, [[decodeFrames]]' stride), decode each sampled MJPEG frame
    * through the real baseline-JPEG path, and average-hash the DECODED
    * pixels. Dims come from the decoded raster, the frame count from the
    * `movi` walk (never the header's claim), fps from avih. Exactly the
    * sampled frames decode — never the whole stream (at 100 TB the movi
    * walk is O(container), the codec O(samples)). An invalid container or
    * ANY undecodable sampled frame opts the whole asset out (flatMap):
    * half-decoded video features are noise, not data. */
  def decodeVideoFrames(assets: DataFrame, n: Int = 2): Dataset[VideoFrames] = {
    require(n >= 2, s"n=$n: need at least first+last")
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        aviScan(bytes, wantFrames = true).toSeq.flatMap { m =>
          val f = m.frames.size
          if (f == 0) Seq.empty
          else {
            val picks = (0 until n)
              .map(j => if (f == 1) 0 else (j.toLong * (f - 1) / (n - 1)).toInt)
              .distinct
            val rows = picks.flatMap { fi =>
              val (o, sz) = m.frames(fi)
              decodeRaster(java.util.Arrays.copyOfRange(bytes, o, o + sz)).map(r =>
                VideoFrames(id, f, m.usPerFrame, fi, r.width, r.height, averageHash(r)))
            }
            if (rows.size == picks.size) rows else Seq.empty // all-or-nothing
          }
        }
      }
  }

  /** Deterministic frame/window sampling plumbing: expand each asset into
    * `n` evenly spaced sample points — byte offsets over the payload here;
    * a real demuxer would seek timestamps at the same seam. The stride
    * math, row expansion, and per-sample addressing are the real
    * machinery: a pure projection + generator (expansion factor exactly
    * `n`, no shuffle), feeding the [[decode]]-shaped per-partition
    * codec stage downstream. Empty payloads opt out (nothing to seek).
    * For GIF payloads [[decodeFrames]] supersedes this with REAL decoded
    * frames. */
  def frameSample(assets: DataFrame, n: Int = 4): DataFrame =
    assets.select(col("asset_id"), length(col("payload")).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), lit((n - 1).toLong))))
      .withColumn("byte_offset",
        floor(col("frame_idx") * col("n_bytes") / lit(n)).cast("long"))

  /** Feature sidecar join-back: narrow table keyed by asset_id. Decode
    * runs once per DISTINCT content hash (duplicate payloads share an
    * asset_id by construction — decoding each copy would both waste the
    * codec and fan the join out t×t per duplicate group). */
  def withFeatures(assets: DataFrame): DataFrame =
    assets.join(decode(assets.dropDuplicates("asset_id")).toDF(), Seq("asset_id"))
}
