package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.Inflater

/** Minimal from-scratch HDF5 reader — enough of the public HDF5 file
  * format spec (superblock v0, v1 symbol-table groups, v1 object
  * headers with continuations, compact/contiguous/chunked layouts,
  * deflate + shuffle filters, fixed-point and IEEE-float datatypes) to
  * open the two HDF5-based formats the reference consumes without any
  * native library:
  *
  *  - MATLAB 7.3 `.mat` files (HDF5 with a 512-byte userblock) — e.g.
  *    CLIMADA's `centr_brb_test.mat` centroid fixtures read by
  *    `Centroids.read_mat` (src/climada/hazard/centroids/centr.py:424);
  *  - NetCDF-4 `.nc` files (plain HDF5) — the IBTrACS source surface
  *    (src/climada/hazard/tc_tracks.py:307-470, SURVEY.md §2.1 S9).
  *
  * Driver-side ingest only (files are small fixture/dimension data);
  * the parsed arrays land in Spark as ordinary DataFrames. Addresses
  * in HDF5 are relative to the superblock base (so the MATLAB
  * userblock is handled by locating the signature).
  */
final class Hdf5File(data: Array[Byte]) {

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  private val base: Int = {
    // signature at offset 0 or any power-of-2 userblock boundary >= 512
    def matches(off: Int) = off + 8 <= data.length &&
      (0 until 8).forall(i => data(off + i) == Signature(i))
    var off = 0
    var found = -1
    while (found < 0 && off < data.length) {
      if (matches(off)) found = off
      off = if (off == 0) 512 else off * 2
    }
    require(found >= 0, "not an HDF5 file (signature not found)")
    found
  }

  private def buf(off: Long, len: Int): ByteBuffer = {
    val b = ByteBuffer.wrap(data, base + off.toInt, len)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b
  }
  private def u8(off: Long): Int = data(base + off.toInt) & 0xff
  private def u16(off: Long): Int = buf(off, 2).getShort & 0xffff
  private def u32(off: Long): Long = buf(off, 4).getInt & 0xffffffffL
  private def u64(off: Long): Long = buf(off, 8).getLong

  require(u8(8) == 0, s"only superblock v0 supported, got v${u8(8)}")
  require(u8(13) == 8 && u8(14) == 8, "only 8-byte offsets/lengths supported")

  /** Root group object header address (superblock v0 symbol-table
    * entry at offset 56: link-name offset, then object header). */
  private val rootHeader: Long = u64(56 + 8)

  // ---- object headers (v1) ---------------------------------------------

  private case class Msg(tpe: Int, body: Long, size: Int)

  private def sig4(off: Long): String = new String(data, base + off.toInt, 4, "US-ASCII")

  private def readHeader(addr: Long): Seq[Msg] =
    if (sig4(addr) == "OHDR") readHeaderV2(addr) else readHeaderV1(addr)

  private def readHeaderV1(addr: Long): Seq[Msg] = {
    require(u8(addr) == 1, s"only v1/v2 object headers supported, got v${u8(addr)}")
    var remaining = u16(addr + 2)
    val msgs = Seq.newBuilder[Msg]
    var blocks = List((addr + 16, u32(addr + 8)))
    while (blocks.nonEmpty && remaining > 0) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var off = start
      val end = start + size
      while (remaining > 0 && off + 8 <= end) {
        val tpe = u16(off)
        val msize = u16(off + 2)
        val body = off + 8
        if (tpe == 0x0010) blocks = blocks :+ (u64(body), u64(body + 8)) // continuation
        else msgs += Msg(tpe, body, msize)
        off = body + msize
        remaining -= 1
      }
    }
    msgs.result()
  }

  /** v2 ("OHDR") object headers — the NetCDF-4 style. Messages carry a
    * 1-byte type; continuation blocks are "OCHK"-signed; both end with
    * a 4-byte checksum we skip. */
  private def readHeaderV2(addr: Long): Seq[Msg] = {
    val flags = u8(addr + 5)
    var off = addr + 6
    if ((flags & 0x20) != 0) off += 16 // times
    if ((flags & 0x10) != 0) off += 4  // max compact/min dense attrs
    val sizeOfChunk0 = 1 << (flags & 0x3)
    val chunk0Size = sizeOfChunk0 match {
      case 1 => u8(off).toLong
      case 2 => u16(off).toLong
      case 4 => u32(off)
      case 8 => u64(off)
    }
    off += sizeOfChunk0
    val trackOrder = (flags & 0x04) != 0
    val msgs = Seq.newBuilder[Msg]
    var blocks = List((off, chunk0Size))
    while (blocks.nonEmpty) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var o = start
      val end = start + size // checksum excluded from declared size
      while (o + 4 <= end) {
        val tpe = u8(o)
        val msize = u16(o + 1)
        var body = o + 4
        if (trackOrder) body += 2
        if (tpe == 0x10) {
          // continuation: "OCHK" + messages + 4-byte checksum
          val caddr = u64(body)
          val clen = u64(body + 8)
          require(sig4(caddr) == "OCHK", "bad v2 continuation block")
          blocks = blocks :+ (caddr + 4, clen - 8) // minus signature + checksum
        } else msgs += Msg(tpe, body, msize)
        o = body + msize
      }
    }
    msgs.result()
  }

  /** Hard links from v2-style compact Link messages (0x0006). */
  private def linkMessages(msgs: Seq[Msg]): Seq[(String, Long)] =
    msgs.filter(_.tpe == 0x0006).flatMap(m => parseLinkBody(m.body))

  // ---- symbol-table groups ---------------------------------------------

  private def cString(off: Long): String = {
    var end = base + off.toInt
    while (data(end) != 0) end += 1
    new String(data, base + off.toInt, end - (base + off.toInt), "US-ASCII")
  }

  /** Dense (fractal-heap) link storage — NetCDF-4's default when the
    * netcdf-c library writes a group. Minimal support: a v2 b-tree
    * whose root is a single leaf, resolving managed heap IDs into a
    * root DIRECT block — the shape every small-to-medium group has. */
  private def denseLinks(linkInfoBody: Long): Seq[(String, Long)] = {
    val liFlags = u8(linkInfoBody + 1)
    var off = linkInfoBody + 2
    if ((liFlags & 1) != 0) off += 8 // max creation index
    val fheapAddr = u64(off)
    val btreeAddr = u64(off + 8)
    if (fheapAddr == -1L || btreeAddr == -1L) return Seq.empty

    // fractal heap header (FRHP)
    require(sig4(fheapAddr) == "FRHP", "bad fractal heap header")
    val idLen = u16(fheapAddr + 5)
    val ioFilterLen = u16(fheapAddr + 7)
    require(ioFilterLen == 0, "filtered fractal heaps not supported")
    // fixed fields: sig(4) ver(1) idlen(2) filterlen(2) flags(1)
    //   maxmanobj(4) nexthuge(8) hugebt(8) freespace(8) fsmgr(8)
    //   manspace(8) allocspace(8) directiter(8) nmanaged(8) hugesize(8)
    //   nhuge(8) tinysize(8) ntiny(8) tablewidth(2) startblock(8)
    //   maxdirect(8) maxheapbits(2) startrows(2) rootaddr(8) currows(2)
    val tableOff = fheapAddr + 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12
    val maxDirectSize = u64(tableOff + 2 + 8)
    val maxHeapBits = u16(tableOff + 2 + 8 + 8)
    val rootAddr = u64(tableOff + 2 + 8 + 8 + 2 + 2)
    val curRows = u16(tableOff + 2 + 8 + 8 + 2 + 2 + 8)
    require(curRows == 0, "indirect-block fractal heaps not supported")
    require(sig4(rootAddr) == "FHDB", "bad fractal heap direct block")
    val offsetBytes = (maxHeapBits + 7) / 8
    val lengthBytes = idLen - 1 - offsetBytes

    def uN(off: Long, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (data(base + off.toInt + i) & 0xffL) << (8 * i); i += 1 }
      v
    }

    // object heap-offset → file offset: root direct block covers heap
    // offsets [0, blockSize) including its own header
    def heapObject(hid: Long): Long = {
      val heapOff = uN(hid + 1, offsetBytes)
      rootAddr + heapOff
    }

    // v2 b-tree (BTHD), type 5 = link-name index; records are
    // hash(4) + heap ID(idLen)
    require(sig4(btreeAddr) == "BTHD", "bad v2 b-tree header")
    val recSize = u16(btreeAddr + 10)
    val depth = u16(btreeAddr + 12)
    require(depth == 0, "multi-level v2 b-trees not supported")
    val rootNode = u64(btreeAddr + 16)
    val rootNRec = u16(btreeAddr + 24)
    require(sig4(rootNode) == "BTLF", "bad v2 b-tree leaf")
    (0 until rootNRec).map { i =>
      val rec = rootNode + 6 + i.toLong * recSize
      val objAddr = heapObject(rec + 4)
      // stored object is a serialized Link message body
      parseLinkBody(objAddr)
    }.collect { case Some(nm) => nm }
  }

  private def parseLinkBody(body: Long): Option[(String, Long)] = {
    val flags = u8(body + 1)
    var off = body + 2
    val linkType = if ((flags & 0x08) != 0) { val t = u8(off); off += 1; t } else 0
    if ((flags & 0x04) != 0) off += 8
    if ((flags & 0x10) != 0) off += 1
    val nameLenSize = 1 << (flags & 0x3)
    val nameLen = (nameLenSize match {
      case 1 => u8(off).toLong
      case 2 => u16(off).toLong
      case 4 => u32(off)
      case 8 => u64(off)
    }).toInt
    off += nameLenSize
    val name = new String(data, base + off.toInt, nameLen, "UTF-8")
    off += nameLen
    if (linkType == 0) Some((name, u64(off))) else None
  }

  /** (name → object header address) for a group: v1 symbol table,
    * v2 compact link messages, or v2 dense storage. */
  private def groupEntries(msgs: Seq[Msg]): Seq[(String, Long)] = {
    val st = msgs.find(_.tpe == 0x0011).getOrElse {
      val links = linkMessages(msgs)
      if (links.nonEmpty) return links
      msgs.find(_.tpe == 0x0002).foreach { li => return denseLinks(li.body) }
      throw new IllegalArgumentException("object is not a group")
    }
    val btree = u64(st.body)
    val heap = u64(st.body + 8)
    require(new String(data, base + heap.toInt, 4, "US-ASCII") == "HEAP", "bad local heap")
    val heapData = u64(heap + 24)
    val out = Seq.newBuilder[(String, Long)]
    def walk(nodeAddr: Long): Unit = {
      require(new String(data, base + nodeAddr.toInt, 4, "US-ASCII") == "TREE", "bad b-tree node")
      val level = u8(nodeAddr + 5)
      val n = u16(nodeAddr + 6)
      var off = nodeAddr + 8 + 16 // past siblings
      val children = (0 until n).map { _ =>
        off += 8 // key (heap offset of first name — unused)
        val c = u64(off); off += 8; c
      }
      children.foreach { c =>
        if (level > 0) walk(c)
        else {
          require(new String(data, base + c.toInt, 4, "US-ASCII") == "SNOD", "bad symbol node")
          val nsym = u16(c + 6)
          var so = c + 8
          (0 until nsym).foreach { _ =>
            out += ((cString(heapData + u64(so)), u64(so + 8)))
            so += 40
          }
        }
      }
    }
    walk(btree)
    out.result()
  }

  private def resolve(path: String): Seq[Msg] = {
    var msgs = readHeader(rootHeader)
    path.split("/").filter(_.nonEmpty).foreach { part =>
      val entries = groupEntries(msgs)
      val next = entries.collectFirst { case (n, a) if n == part => a }.getOrElse(
        throw new NoSuchElementException(
          s"'$part' not found; siblings: ${entries.map(_._1).mkString(", ")}"))
      msgs = readHeader(next)
    }
    msgs
  }

  /** Child names of a group. */
  def list(path: String): Seq[String] = groupEntries(resolve(path)).map(_._1)

  // ---- datasets --------------------------------------------------------

  private case class Dtype(clazz: Int, size: Int, signed: Boolean)

  private def parseMsgs(msgs: Seq[Msg]): (Array[Long], Dtype, Msg, Seq[(Int, Array[Int])]) = {
    val space = msgs.find(_.tpe == 0x0001).getOrElse(sys.error("no dataspace"))
    val spaceVer = u8(space.body)
    val ndim = u8(space.body + 1)
    val dimsOff = if (spaceVer >= 2) 4L else 8L
    val dims = Array.tabulate(ndim)(i => u64(space.body + dimsOff + 8L * i))
    val dt = msgs.find(_.tpe == 0x0003).getOrElse(sys.error("no datatype"))
    val clazz = u8(dt.body) & 0x0f
    val signed = (u8(dt.body + 1) & 0x08) != 0
    val dtype = Dtype(clazz, u32(dt.body + 4).toInt, signed)
    val layout = msgs.find(_.tpe == 0x0008).getOrElse(sys.error("no layout"))
    val filters = msgs.find(_.tpe == 0x000B).map { f =>
      val fver = u8(f.body)
      val nf = u8(f.body + 1)
      var off = f.body + (if (fver >= 2) 2L else 8L)
      (0 until nf).map { _ =>
        val id = u16(off)
        val hasName = fver < 2 || id >= 256
        val nameLen = if (hasName) u16(off + 2) else 0
        val fieldOff = if (hasName) off + 4 else off + 2
        val nvals = u16(fieldOff + 2)
        var cdOff = fieldOff + 4 + nameLen
        if (fver < 2 && nameLen % 8 != 0) cdOff += 8 - nameLen % 8 // v1 name padding
        val cd = Array.tabulate(nvals)(i => u32(cdOff + 4L * i).toInt)
        off = cdOff + 4L * nvals + (if (fver < 2 && nvals % 2 == 1) 4 else 0)
        (id, cd)
      }
    }.getOrElse(Seq.empty)
    (dims, dtype, layout, filters)
  }

  private def applyFilters(raw: Array[Byte], filters: Seq[(Int, Array[Int])],
                           elemSize: Int): Array[Byte] =
    filters.reverse.foldLeft(raw) { case (bytes, (id, _)) =>
      id match {
        case 1 => // deflate
          val inf = new Inflater()
          inf.setInput(bytes)
          val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
          val tmp = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            if (n == 0 && inf.needsInput()) sys.error("truncated deflate stream")
            out.write(tmp, 0, n)
          }
          inf.end()
          out.toByteArray
        case 2 => // shuffle: de-interleave byte planes
          val n = bytes.length / elemSize
          val out = new Array[Byte](bytes.length)
          var j = 0
          while (j < elemSize) {
            var i = 0
            while (i < n) { out(i * elemSize + j) = bytes(j * n + i); i += 1 }
            j += 1
          }
          out
        case 3 => // fletcher32: strip the 4-byte checksum trailer so downstream
          // filters (e.g. shuffle without deflate) see only payload bytes
          if (bytes.length < 4) sys.error("fletcher32 chunk shorter than checksum")
          else java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 4)
        case other => sys.error(s"unsupported HDF5 filter id $other")
      }
    }

  /** Fill-value bytes for unallocated data: the fill-value message
    * (0x0005) pattern repeated, else zeros. */
  private def fillBytes(msgs: Seq[Msg], dtype: Dtype, total: Int): Array[Byte] = {
    val out = new Array[Byte](total)
    msgs.find(_.tpe == 0x0005).foreach { m =>
      val ver = u8(m.body)
      val (defined, sizeOff) =
        if (ver >= 3) (((u8(m.body + 1) & 0x20) != 0), m.body + 2L)
        else ((u8(m.body + 3) == 1), m.body + 4L)
      if (defined && u32(sizeOff) == dtype.size) {
        val pat = java.util.Arrays.copyOfRange(data,
          base + sizeOff.toInt + 4, base + sizeOff.toInt + 4 + dtype.size)
        var i = 0
        while (i < total) { System.arraycopy(pat, 0, out, i, dtype.size); i += dtype.size }
      }
    }
    out
  }

  /** Raw dataset bytes in logical element order. */
  private def rawBytes(path: String): (Array[Byte], Array[Long], Dtype) = {
    val msgs = resolve(path)
    val (dims, dtype, layout, filters) = parseMsgs(msgs)
    val total = dims.product.toInt * dtype.size
    require(u8(layout.body) == 3, s"only layout v3 supported, got v${u8(layout.body)}")
    val lclass = u8(layout.body + 1)
    val bytes = lclass match {
      case 0 => // compact: 2-byte size then inline data
        val sz = u16(layout.body + 2)
        java.util.Arrays.copyOfRange(data, base + layout.body.toInt + 4,
          base + layout.body.toInt + 4 + sz)
      case 1 => // contiguous
        val addr = u64(layout.body + 2)
        if (addr == -1L) fillBytes(msgs, dtype, total) // never written → fill value
        else java.util.Arrays.copyOfRange(data, base + addr.toInt, base + addr.toInt + total)
      case 2 => // chunked: v1 b-tree of filtered chunks
        val ndim = u8(layout.body + 2) - 1 // stored ndim includes element dim
        val btree = u64(layout.body + 3)
        val chunkDims = Array.tabulate(ndim)(i => u32(layout.body + 11 + 4L * i).toInt)
        val out = new Array[Byte](total)
        def walk(nodeAddr: Long): Unit = {
          require(new String(data, base + nodeAddr.toInt, 4, "US-ASCII") == "TREE", "bad chunk b-tree")
          val level = u8(nodeAddr + 5)
          val n = u16(nodeAddr + 6)
          val keySize = 8 + 8 * (ndim + 1)
          var off = nodeAddr + 8 + 16
          (0 until n).foreach { _ =>
            val chunkBytes = u32(off).toInt
            val offsets = Array.tabulate(ndim)(i => u64(off + 8 + 8L * i))
            val child = u64(off + keySize)
            if (level > 0) walk(child)
            else {
              val raw = java.util.Arrays.copyOfRange(
                data, base + child.toInt, base + child.toInt + chunkBytes)
              val plain = applyFilters(raw, filters, dtype.size)
              copyChunk(plain, offsets, chunkDims, dims, dtype.size, out)
            }
            off += keySize + 8
          }
        }
        if (btree != -1L) walk(btree)
        out
      case other => sys.error(s"unsupported layout class $other")
    }
    (bytes, dims, dtype)
  }

  /** Copy one decoded chunk into the logical row-major output array,
    * clipping partial edge chunks. */
  private def copyChunk(chunk: Array[Byte], offsets: Array[Long], chunkDims: Array[Int],
                        dims: Array[Long], elemSize: Int, out: Array[Byte]): Unit = {
    val ndim = chunkDims.length
    def rec(dim: Int, srcBase: Int, dstBase: Long): Unit = {
      if (dim == ndim - 1) {
        val copyN = math.min(chunkDims(dim).toLong, dims(dim) - offsets(dim)).toInt
        if (copyN > 0)
          System.arraycopy(chunk, srcBase * elemSize, out,
            (dstBase + offsets(dim)).toInt * elemSize, copyN * elemSize)
      } else {
        val n = math.min(chunkDims(dim).toLong, dims(dim) - offsets(dim)).toInt
        val srcStride = chunkDims.drop(dim + 1).product
        val dstStride = dims.drop(dim + 1).product
        var i = 0
        while (i < n) {
          rec(dim + 1, srcBase + i * srcStride,
            (dstBase + (offsets(dim) + i) * dstStride) * 1)
          i += 1
        }
      }
    }
    rec(0, 0, 0L)
  }

  /** Dataset dimensions (as stored — note MATLAB stores column-major,
    * so a MATLAB (n×1) vector appears as dims [n, 1]). */
  def dims(path: String): Array[Long] = parseMsgs(resolve(path))._1

  /** Read a numeric dataset as doubles (any fixed-point or float type). */
  def readDoubles(path: String): Array[Double] = {
    val (bytes, dims, dtype) = rawBytes(path)
    val n = dims.product.toInt
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    (dtype.clazz, dtype.size) match {
      case (1, 8) => while (i < n) { out(i) = b.getDouble(i * 8); i += 1 }
      case (1, 4) => while (i < n) { out(i) = b.getFloat(i * 4).toDouble; i += 1 }
      case (0, 8) => while (i < n) { out(i) = b.getLong(i * 8).toDouble; i += 1 }
      case (0, 4) => while (i < n) { out(i) = (if (dtype.signed) b.getInt(i * 4).toLong
                                               else b.getInt(i * 4) & 0xffffffffL).toDouble; i += 1 }
      case (0, 2) => while (i < n) { out(i) = (if (dtype.signed) b.getShort(i * 2).toLong
                                               else b.getShort(i * 2) & 0xffffL).toDouble; i += 1 }
      case (0, 1) => while (i < n) { out(i) = (if (dtype.signed) bytes(i).toLong
                                               else bytes(i) & 0xffL).toDouble; i += 1 }
      case other => sys.error(s"unsupported datatype $other")
    }
    out
  }

  /** Attributes of an object: name → raw value (String for fixed
    * strings, Array[Double] for numerics). Covers attribute message
    * v1 (8-byte-padded parts) and v3 (packed). */
  def attributes(path: String): Map[String, Any] =
    resolve(path).filter(_.tpe == 0x000C).flatMap { m =>
      val ver = u8(m.body)
      val nameSize = u16(m.body + 2)
      val dtSize = u16(m.body + 4)
      val spSize = u16(m.body + 6)
      def pad8(n: Int) = (n + 7) / 8 * 8
      val (nameOff, packed) =
        if (ver >= 3) (m.body + 9, true)
        else (m.body + 8, false)
      val name = cString(nameOff)
      val dtOff = nameOff + (if (packed) nameSize else pad8(nameSize))
      val spOff = dtOff + (if (packed) dtSize else pad8(dtSize))
      val dataOff = spOff + (if (packed) spSize else pad8(spSize))
      val clazz = u8(dtOff) & 0x0f
      val elemSize = u32(dtOff + 4).toInt
      val spaceVer = u8(spOff)
      val ndim = u8(spOff + 1)
      val dimsOff = if (spaceVer >= 2) 4L else 8L
      val n = if (ndim == 0) 1
              else (0 until ndim).map(i => u64(spOff + dimsOff + 8L * i)).product.toInt
      val value: Option[Any] = clazz match {
        case 3 => // fixed string
          val raw = new String(data, base + dataOff.toInt, elemSize * n, "UTF-8")
          Some(raw.takeWhile(_ != '\u0000'))
        case 0 | 1 =>
          val b = ByteBuffer.wrap(data, base + dataOff.toInt, elemSize * n)
            .order(ByteOrder.LITTLE_ENDIAN)
          Some(Array.tabulate(n) { i =>
            (clazz, elemSize) match {
              case (1, 8) => b.getDouble(i * 8)
              case (1, 4) => b.getFloat(i * 4).toDouble
              case (0, 8) => b.getLong(i * 8).toDouble
              case (0, 4) => b.getInt(i * 4).toDouble
              case (0, 2) => b.getShort(i * 2).toDouble
              case (0, 1) => b.get(i).toDouble
              case _ => Double.NaN
            }
          })
        case _ => None // vlen/compound attributes not needed
      }
      value.map(name -> _)
    }.toMap

  /** Read a MATLAB char array (uint16 code units) as a string. */
  def readMatString(path: String): String = {
    val (bytes, dims, dtype) = rawBytes(path)
    require(dtype.size == 2, s"expected uint16 char data, got size ${dtype.size}")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val chars = Array.tabulate(dims.product.toInt)(i => b.getShort(i * 2).toChar)
    new String(chars)
  }
}

object Hdf5File {
  def open(path: String): Hdf5File =
    new Hdf5File(Files.readAllBytes(Paths.get(path)))
}
