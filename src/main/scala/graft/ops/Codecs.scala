package graft.ops

/** Shared PNG encode/decode entry points for the multimodal codec rows.
  *
  * Why not `ImageIO.write(img, "png", outputStream)` /
  * `ImageIO.read(inputStream)` directly: with the JDK default
  * `ImageIO.getUseCache() == true` both static conveniences wrap the
  * stream in a FileCache{Input,Output}Stream — every encode and every
  * decode creates, writes and deletes a TEMP FILE on disk. A multimodal
  * row moves thousands of sub-100-kB rasters per run, so the codec stage
  * pays thousands of filesystem round-trips that contend globally once
  * the stage fans out across cores (optimization guide §1.2: fix the
  * per-task work). These helpers pin the memory-cached stream variants —
  * strictly better for in-memory byte-array payloads at any scale — and
  * keep the plugin lookup per call (cheap, and writer instances are not
  * thread-safe so per-call instances stay correct under fanout).
  */
object Codecs {
  // belt-and-braces: any ImageIO path not routed through the helpers
  // (e.g. a future row) also skips the disk cache in this JVM
  javax.imageio.ImageIO.setUseCache(false)

  /** PNG-encode through an explicit in-memory ImageOutputStream. */
  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode an image from bytes through an in-memory ImageInputStream. */
  def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}
