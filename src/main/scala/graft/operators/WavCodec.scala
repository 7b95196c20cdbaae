package graft.operators

/** Pure-JVM codec for the public RIFF/WAVE audio format (16-bit mono
  * PCM) — the audio counterpart of [[BmpCodec]], so the multimodal
  * operators exercise a REAL second media format end to end with no
  * audio library. Layout per the public RIFF specification: a 12-byte
  * RIFF header (`RIFF`, chunk size, `WAVE`), then sub-chunks each with
  * a 4-byte id + little-endian u32 length; the decoder walks chunks in
  * any order and skips unknown ones (LIST/INFO etc.), requiring one
  * `fmt ` (PCM, 1 channel, 16-bit) and one `data` chunk.
  */
object WavCodec {

  /** Decoded audio: 16-bit signed samples in file order. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode raw bytes as 16-bit mono PCM: each input byte `u` (0..255)
    * becomes the sample `(u - 128) * 256`, spanning the full signed
    * range symmetrically. Deterministic: same content → identical file
    * bytes. An empty payload yields a valid zero-sample WAV.
    */
  def encode(content: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataLen = content.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < content.length) {
      buf.putShort((((content(i) & 0xFF) - 128) * 256).toShort)
      i += 1
    }
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: validates the RIFF/WAVE magic, walks
    * the sub-chunk list (tolerating unknown chunks and the odd-length
    * pad byte the RIFF spec mandates), and requires 16-bit mono PCM.
    */
  def decode(wav: Array[Byte]): Audio = {
    require(wav.length >= 44, s"payload too short for a WAV header (${wav.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(wav, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= wav.length) {
      val id = tag(off)
      val len = buf.getInt(off + 4)
      require(len >= 0 && off + 8 + len.toLong <= wav.length,
        s"chunk '$id' overruns the payload (len=$len at offset $off)")
      if (id == "fmt ") {
        require(len >= 16, s"fmt chunk too short ($len)")
        require(buf.getShort(off + 8) == 1, "only PCM (format 1) supported")
        require(buf.getShort(off + 10) == 1, "only mono supported")
        sampleRate = buf.getInt(off + 12)
        require(sampleRate > 0, s"bad sample rate $sampleRate")
        require(buf.getShort(off + 22) == 16, "only 16-bit samples supported")
      } else if (id == "data") {
        require(len % 2 == 0, s"odd PCM data length $len")
        val out = new Array[Short](len / 2)
        var i = 0
        while (i < out.length) { out(i) = buf.getShort(off + 8 + i * 2); i += 1 }
        samples = out
      }
      // chunks are word-aligned: an odd length is followed by a pad byte
      off += 8 + len + (len & 1)
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(sampleRate, samples)
  }
}
