package graft.operators

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** JPEG/PNG (and any other `javax.imageio`-supported format) codec for
  * the multimodal path — the JDK's built-in image plugins, no external
  * library. Complements [[BmpCodec]] (the hand-rolled 24-bpp BMP
  * parser): BMP exercises a from-scratch binary parse, this covers the
  * compressed formats a realistic corpus actually contains.
  *
  * Pixel layout contract (shared with [[BmpCodec]] so the two decode
  * paths are drop-in interchangeable): decoded pixels are 8-bit
  * B,G,R-interleaved, row-major, top-down — `TYPE_3BYTE_BGR`'s native
  * buffer order. Encoding packs payload byte i into channel position i
  * of that layout (zero-padded to full rows), so for the LOSSLESS
  * formats (PNG, BMP) decode(encode(bytes)) recovers the bytes exactly
  * and per-channel sums are SQL-reproducible from the source text
  * (byte i → channel i mod 3 — the q33/q170 oracle shape). JPEG is
  * lossy by design: geometry survives exactly, channel values only
  * approximately (spec-gated, not oracle-checked).
  *
  * Threading/scale: one `ImageIO.read` per image, no shared state;
  * the ImageIO disk cache is disabled (in-memory streams only) so
  * executor-side decode never touches local disk.
  */
object ImageIoCodec {

  ImageIO.setUseCache(false)

  /** Decoded image: B,G,R interleaved bytes, row-major, top-down. */
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

  /** Rows needed for nBytes of 3-byte pixels at `width` — minimum 1
    * (an empty payload still encodes as one zero row), matching
    * [[BmpCodec.heightFor]].
    */
  def heightFor(nBytes: Int, width: Int): Int =
    math.max((nBytes + 3 * width - 1) / (3 * width), 1)

  private def toImage(bytes: Array[Byte], width: Int): BufferedImage = {
    require(width > 0, s"width must be positive, got $width")
    val h = heightFor(bytes.length, width)
    val img = new BufferedImage(width, h, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    System.arraycopy(bytes, 0, data, 0, math.min(bytes.length, data.length))
    img
  }

  private def encode(bytes: Array[Byte], width: Int, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ok = ImageIO.write(toImage(bytes, width), format, out)
    require(ok, s"no ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Payload bytes → real PNG (lossless: decode recovers the bytes). */
  def encodePng(bytes: Array[Byte], width: Int): Array[Byte] =
    encode(bytes, width, "png")

  /** Payload bytes → real JPEG (lossy: geometry exact, values close).
    * `quality` ∈ (0, 1]: explicit rather than the writer's 0.75
    * default, because packed-byte "images" are high-frequency content
    * — the worst case for DCT quantization.
    */
  def encodeJpeg(bytes: Array[Byte], width: Int, quality: Float = 0.95f): Array[Byte] = {
    require(quality > 0f && quality <= 1f, s"quality must be in (0,1], got $quality")
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toImage(bytes, width), null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG, JPEG, BMP, GIF, …) to
    * the B,G,R top-down layout. Non-BGR source rasters are converted
    * via an exact per-channel copy (opaque 8-bit images draw without
    * resampling or color-space loss).
    */
  def decode(payload: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "ImageIO found no reader for payload (unknown format)")
    val bgr =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_3BYTE_BGR)
        val g = c.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        c
      }
    DecodedImage(bgr.getWidth, bgr.getHeight,
      bgr.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData)
  }
}
