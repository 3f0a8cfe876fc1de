package graft.llm

/** Pure-JVM media-header probes — PNG IHDR, JPEG SOFn marker scan, GIF
  * logical screen descriptor, WAV (RIFF) duration. No codec library: only
  * the fixed header layouts each format specifies, so probing costs a few
  * dozen byte reads per payload regardless of media size. Returns None
  * for anything unrecognized or truncated (the caller's decode_error
  * channel).
  *
  * This replaces the hash-derived fake metadata the multimodal stub used
  * for images and uncompressed audio; compressed audio/video duration
  * still requires a real codec and remains stubbed
  * ([[Multimodal.stubDecode]]).
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
}
