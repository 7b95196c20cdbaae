package graft.operators

/** Pure-JVM codec for the public BMP image format (24-bpp uncompressed
  * BI_RGB, BITMAPFILEHEADER + BITMAPINFOHEADER) — no image library
  * required, so the multimodal operators decode REAL bytes in this
  * environment instead of stubbing. Layout per the public Windows BMP
  * specification: 14-byte file header ('BM', file size, pixel-data
  * offset), 40-byte DIB header (dimensions, planes=1, 24 bpp,
  * compression=0), then pixel rows bottom-up (top-down when height is
  * negative), each row BGR triplets padded to a 4-byte boundary.
  */
object BmpCodec {

  /** Decoded image: `pixels` is top-down row-major BGR, padding
    * stripped — height·width·3 bytes.
    */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  private def rowPadded(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Rows needed to hold `contentLen` bytes at this width — the single
    * source of truth for encoded image height (also used by
    * [[Multimodal.bmpFromText]] for record metadata).
    */
  def heightFor(contentLen: Int, width: Int): Int =
    math.max(1, (contentLen + width * 3 - 1) / (width * 3))

  /** Encode raw bytes as a 24-bpp bottom-up BMP of the given width:
    * the content fills pixels row-major top-down in BGR byte order,
    * zero-padded to fill the last row. Deterministic: the same content
    * always yields the identical file bytes.
    */
  def encode(content: Array[Byte], width: Int): Array[Byte] = {
    require(width > 0, "width must be positive")
    val rowData = width * 3
    val padded = rowPadded(width)
    val height = heightFor(content.length, width)
    val dataSize = padded * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up storage: last logical row first
    while (y >= 0) {
      var i = 0
      while (i < rowData) {
        val src = y * rowData + i
        buf.put(if (src < content.length) content(src) else 0.toByte)
        i += 1
      }
      var p = rowData
      while (p < padded) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bpp uncompressed BMP: validates the 'BM' magic, reads
    * the pixel-data offset and dimensions from the headers, handles
    * both bottom-up (positive height) and top-down (negative height)
    * row order, and strips row padding.
    */
  def decode(bmp: Array[Byte]): Image = {
    require(bmp.length >= 54 && bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte,
      "not a BMP payload (missing 'BM' magic)")
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    // bound header-controlled dimensions BEFORE any arithmetic on them:
    // a corrupt width like 0x40000000 would overflow rowData negative
    // and slip past the truncation check into an allocation crash
    require(width > 0 && width <= (1 << 20), s"unreasonable width $width")
    require(height > 0 && height <= (1 << 20), s"unreasonable height $height")
    require(width.toLong * height <= (1L << 28),
      s"pixel count ${width.toLong * height} exceeds decoder cap")
    require(pixelOffset >= 54 && pixelOffset <= bmp.length, "bad pixel-data offset")
    require(buf.getShort(26) == 1, "planes must be 1")
    require(buf.getShort(28) == 24, s"only 24 bpp supported, got ${buf.getShort(28)}")
    require(buf.getInt(30) == 0, "only uncompressed BI_RGB supported")
    val rowData = width * 3
    val padded = rowPadded(width)
    require(bmp.length >= pixelOffset + padded.toLong * height,
      "truncated pixel data")
    val out = new Array[Byte](rowData * height)
    var row = 0
    while (row < height) {
      val logical = if (topDown) row else height - 1 - row
      System.arraycopy(bmp, pixelOffset + row * padded, out, logical * rowData, rowData)
      row += 1
    }
    Image(width, height, out)
  }
}
