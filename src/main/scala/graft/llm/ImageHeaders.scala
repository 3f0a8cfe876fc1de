package graft.llm

/** Pure-JVM media-header probes — PNG IHDR, JPEG SOFn marker scan, GIF
  * logical screen descriptor, WAV (RIFF) duration, MP3 frame-header /
  * Xing duration, MP4 (ISO-BMFF) mvhd duration. No codec library: only
  * the fixed header layouts each format specifies, so probing costs a few
  * dozen byte reads per payload regardless of media size. Returns None
  * for anything unrecognized or truncated (the caller's decode_error
  * channel).
  *
  * This replaces the hash-derived fake metadata the multimodal stub used
  * to emit: every format here reads REAL payload bytes, and anything not
  * covered surfaces as null + decode_error instead of fiction.
  */
object ImageHeaders {

  private def u8(b: Byte): Int = b & 0xff
  private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))
  private def be32(a: Array[Byte], i: Int): Int =
    (u8(a(i)) << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))
  private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)

  private val pngSig: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** (width, height) when the payload starts with a recognized image
    * header; None otherwise.
    */
  def dimensions(b: Array[Byte]): Option[(Int, Int)] =
    if (b == null) None
    else if (isPng(b)) pngDims(b)
    else if (isJpeg(b)) jpegDims(b)
    else if (isGif(b)) Some((le16(b, 6), le16(b, 8)))
    else None

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && pngSig.indices.forall(i => u8(b(i)) == pngSig(i))

  /** PNG: the first chunk after the 8-byte signature must be IHDR; width
    * and height are the chunk's first two big-endian u32 fields.
    */
  private def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b(0)) == 0xff && u8(b(1)) == 0xd8

  /** JPEG: walk FF-marker segments until a start-of-frame (SOF0..SOF15
    * minus DHT/JPG/DAC), whose payload is precision(1) height(2) width(2).
    */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b(i)) != 0xff) return None
      var j = i
      while (j + 1 < b.length && u8(b(j + 1)) == 0xff) j += 1 // fill bytes
      if (j + 1 >= b.length) return None
      val marker = u8(b(j + 1))
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 2 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF
      } else {
        if (j + 4 > b.length) return None
        val len = be16(b, j + 2)
        if (len < 2 || j + 2 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          return if (len >= 7) Some((be16(b, j + 7), be16(b, j + 5))) else None
        }
        i = j + 2 + len
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F'

  private def le32(a: Array[Byte], i: Int): Long =
    (u8(a(i)) | (u8(a(i + 1)) << 8) | (u8(a(i + 2)) << 16) |
      (u8(a(i + 3)).toLong << 24)) & 0xffffffffL

  /** WAV (RIFF/WAVE) duration probe: walk the chunk list for `fmt ` (byte
    * rate at offset 8 of its payload) and `data` (payload size), duration
    * = data bytes * 1000 / byte rate. Chunk sizes are trusted as real
    * probes do — the data payload itself need not be present. Chunks are
    * word-aligned (odd sizes pad one byte). None for anything that is not
    * a RIFF/WAVE or lacks either chunk.
    */
  def wavDurationMs(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 28) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    var i = 12
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (byteRate < 0 || dataSize < 0)) {
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      val size = le32(b, i + 4)
      // the byte rate is at fmt-payload offset 8..11: require the chunk
      // to DECLARE at least 12 bytes, not just the buffer to have them —
      // a short fmt chunk must not read the next chunk's header bytes
      if (isFmt && size >= 12 && i + 8 + 12 <= b.length)
        byteRate = le32(b, i + 16)
      if (isData) dataSize = size
      // advance in Long: a corrupt size near 2^31 must terminate the
      // walk, not wrap the Int cursor into a negative array index
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (byteRate > 0 && dataSize >= 0) Some(dataSize * 1000L / byteRate)
    else None
  }

  // ------------------------------------------------------------------
  // MP3 (MPEG audio) duration
  // ------------------------------------------------------------------

  // bitrate (kbps) tables indexed by [row][bitrateIndex]; row selected by
  // (version, layer). Index 0 is "free format" and 15 is invalid — both
  // rejected. Layout per ISO/IEC 11172-3 / 13818-3.
  private val brV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val brV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val brV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val brV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  // sample rates (Hz) by [version][sampleRateIndex]; version code 0=MPEG2.5,
  // 2=MPEG2, 3=MPEG1 (code 1 is reserved).
  private val srByVersion: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  /** MP3 duration probe: skip an ID3v2 tag if present, parse the first
    * MPEG audio frame header (version / layer / bitrate / sample rate),
    * then prefer the Xing/Info VBR frame count when the first frame
    * carries one (duration = frames × samplesPerFrame / sampleRate);
    * otherwise assume CBR (duration = audioBytes × 8 / bitrate) — the
    * same two-path estimate every tag-reader uses. None when no valid
    * frame sync is found.
    */
  def mp3DurationMs(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 4) return None
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe u28 size(4)
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val next = 10L + size
      if (next + 4 > b.length) return None
      i = next.toInt
    }
    if (!(u8(b(i)) == 0xff && (u8(b(i + 1)) & 0xe0) == 0xe0)) return None
    val version = (u8(b(i + 1)) >> 3) & 3 // 0=2.5, 1=reserved, 2=V2, 3=V1
    val layer = (u8(b(i + 1)) >> 1) & 3   // 1=III, 2=II, 3=I
    if (version == 1 || layer == 0) return None
    val brIdx = (u8(b(i + 2)) >> 4) & 0xf
    val srIdx = (u8(b(i + 2)) >> 2) & 3
    if (brIdx == 0 || brIdx == 0xf || srIdx == 3) return None
    val table =
      if (version == 3) { if (layer == 3) brV1L1 else if (layer == 2) brV1L2 else brV1L3 }
      else { if (layer == 3) brV2L1 else brV2L23 }
    val kbps = table(brIdx)
    val sampleRate = srByVersion(version)(srIdx)
    val samplesPerFrame =
      if (layer == 3) 384
      else if (layer == 2) 1152
      else if (version == 3) 1152 else 576 // layer III halves for V2/V2.5
    // Xing/Info VBR header sits after the side info of the first frame;
    // protection bit 0 (header byte 1, bit 0) means a 2-byte CRC-16
    // precedes the side info, shifting the Xing/Info block (ADVICE r8)
    val mono = ((u8(b(i + 3)) >> 6) & 3) == 3
    val crcBytes = if ((u8(b(i + 1)) & 1) == 0) 2 else 0
    val sideInfo =
      if (version == 3) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }
    val x = i + 4 + crcBytes + sideInfo
    if (x + 8 <= b.length &&
        ((b(x) == 'X' && b(x + 1) == 'i' && b(x + 2) == 'n' && b(x + 3) == 'g') ||
         (b(x) == 'I' && b(x + 1) == 'n' && b(x + 2) == 'f' && b(x + 3) == 'o'))) {
      val flags = be32(b, x + 4)
      if ((flags & 1) != 0 && x + 12 <= b.length) {
        val frames = be32(b, x + 8).toLong & 0xffffffffL
        return Some(frames * samplesPerFrame * 1000L / sampleRate)
      }
    }
    // CBR estimate over the audio region (payload from first sync onward)
    val audioBytes = (b.length - i).toLong
    Some(audioBytes * 8L / kbps) // bytes*8/(kbps*1000) sec = bytes*8/kbps ms
  }

  // ------------------------------------------------------------------
  // MP4 / ISO-BMFF duration
  // ------------------------------------------------------------------

  private def be64(a: Array[Byte], i: Int): Long =
    ((be32(a, i).toLong & 0xffffffffL) << 32) | (be32(a, i + 4).toLong & 0xffffffffL)

  private def boxType(a: Array[Byte], i: Int): String =
    new String(a, i, 4, "US-ASCII")

  /** MP4 duration probe: walk the top-level ISO-BMFF box list for `moov`,
    * then its children for `mvhd`, and read timescale + duration (version
    * 0: u32s; version 1: u64 duration) — duration_ms = duration × 1000 /
    * timescale. Only payloads whose first box is a plausible BMFF type
    * (`ftyp`/`moov`/…) are treated as MP4. Box sizes are trusted as real
    * probes do; 64-bit `largesize` boxes and corrupt sizes terminate the
    * walk instead of wrapping the cursor.
    */
  def mp4DurationMs(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 16) return None
    val first = boxType(b, 4)
    if (!Set("ftyp", "moov", "free", "skip", "wide", "mdat", "pnot", "styp")
          .contains(first)) return None
    var i = 0L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val size32 = be32(b, ii).toLong & 0xffffffffL
      val tpe = boxType(b, ii + 4)
      val (payload, boxSize) =
        if (size32 == 1L) {
          if (i + 16 > b.length) return None
          (i + 16, be64(b, ii + 8))
        } else if (size32 == 0L) (i + 8, b.length - i) // box runs to EOF
        else (i + 8, size32)
      if (boxSize < 8) return None
      if (tpe == "moov") return mvhdInRange(b, payload, (i + boxSize).min(b.length.toLong))
      i += boxSize
    }
    None
  }

  private def mvhdInRange(b: Array[Byte], from: Long, to: Long): Option[Long] = {
    var i = from
    while (i + 8 <= to) {
      val ii = i.toInt
      val size32 = be32(b, ii).toLong & 0xffffffffL
      val tpe = boxType(b, ii + 4)
      val boxSize = if (size32 == 0L) to - i else size32
      if (boxSize < 8) return None
      if (tpe == "mvhd") {
        if (i + 9 > to) return None
        val version = u8(b(ii + 8))
        return version match {
          case 0 if i + 28 <= to =>
            val ts = be32(b, ii + 20).toLong & 0xffffffffL
            val dur = be32(b, ii + 24).toLong & 0xffffffffL
            if (ts > 0) Some(dur * 1000L / ts) else None
          case 1 if i + 40 <= to =>
            val ts = be32(b, ii + 28).toLong & 0xffffffffL
            val dur = be64(b, ii + 32)
            if (ts > 0 && dur >= 0) Some(dur * 1000L / ts) else None
          case _ => None
        }
      }
      i += boxSize
    }
    None
  }

  /** Combined audio/video duration probe: WAV, then MP3, then MP4. */
  def durationMs(b: Array[Byte]): Option[Long] =
    wavDurationMs(b).orElse(mp3DurationMs(b)).orElse(mp4DurationMs(b))
}
