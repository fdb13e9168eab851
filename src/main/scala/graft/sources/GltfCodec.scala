package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.TriMesh

/** glTF 2.0 / GLB triangle-mesh codec — the engine's `gltf_to_vtk`
  * (/root/reference/pd_vtk.py:1058-1091): every primitive's `indices`
  * accessor becomes faces and its `POSITION` accessor becomes vertices,
  * sliced out of the binary blob through bufferView + accessor offsets.
  * Texture/material decode is viz-only there (skimage → pv.Texture) and
  * is skipped here; all primitives concatenate into one [[TriMesh]] with
  * re-based face indices.
  *
  * Containers: `.glb` (JSON + BIN chunks) and `.gltf` whose buffer is a
  * base64 `data:` URI — the two self-contained public forms. The writer
  * emits a minimal spec-valid GLB (float32 positions with required
  * min/max, uint32 indices, one primitive). */
object GltfCodec {

  private val Magic = 0x46546c67 // "glTF" little-endian

  def read(path: String): TriMesh = read(path, VtkLegacy.meshName(path))

  def read(path: String, name: String): TriMesh = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val (json, buffers) =
      if (bytes.length >= 12 &&
          ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == Magic)
        parseGlb(bytes)
      else {
        val root = new String(bytes, StandardCharsets.UTF_8)
        (root, dataUriBuffers(new ObjectMapper().readTree(root)))
      }
    val root = new ObjectMapper().readTree(json)
    val accessors = root.get("accessors")
    val views = root.get("bufferViews")

    /** Accessor bytes; `elemSize` = the accessor's tight element width, so
      * a byteStride equal to it (what exporters emit when two accessors
      * share a view) is accepted — only true interleaving is rejected. */
    def slice(accessor: JsonNode, elemSize: Int): ByteBuffer = {
      val bv = views.get(accessor.get("bufferView").asInt)
      val stride = optInt(bv, "byteStride")
      require(stride == 0 || stride == elemSize,
        s"interleaved bufferView (byteStride $stride != element size $elemSize) unsupported")
      val bufIdx = optInt(bv, "buffer")
      require(bufIdx >= 0 && bufIdx < buffers.length,
        s"bufferView references missing buffer $bufIdx")
      val bin = buffers(bufIdx)
      val off = optInt(bv, "byteOffset") + optInt(accessor, "byteOffset")
      ByteBuffer.wrap(bin, off, bv.get("byteLength").asInt - optInt(accessor, "byteOffset"))
        .order(ByteOrder.LITTLE_ENDIAN)
    }

    val verts = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tris = scala.collection.mutable.ArrayBuffer.empty[Int]
    val meshes = root.get("meshes")
    require(meshes != null && meshes.size > 0, s"no meshes in $path")
    meshes.forEach { m =>
      m.get("primitives").forEach { p =>
        // triangles only (mode 4 is the default)
        require(optInt(p, "mode", 4) == 4, "non-triangle glTF primitive")
        val base = verts.length / 3
        val pos = accessors.get(p.get("attributes").get("POSITION").asInt)
        require(pos.get("type").asText == "VEC3" &&
          pos.get("componentType").asInt == 5126, // FLOAT
          "POSITION must be float32 VEC3")
        val pb = slice(pos, 12) // VEC3 float32
        (0 until pos.get("count").asInt * 3).foreach(_ => verts += pb.getFloat.toDouble)
        val idx = accessors.get(p.get("indices").asInt)
        val (idxSize, read): (Int, ByteBuffer => Int) =
          idx.get("componentType").asInt match {
            case 5121 => (1, b => b.get() & 0xff)        // UNSIGNED_BYTE
            case 5123 => (2, b => b.getShort() & 0xffff) // UNSIGNED_SHORT
            case 5125 => (4, b => b.getInt())            // UNSIGNED_INT
            case t => throw new IllegalArgumentException(s"index componentType $t")
          }
        val ib = slice(idx, idxSize)
        (0 until idx.get("count").asInt).foreach(_ => tris += base + read(ib))
      }
    }
    TriMesh(name, verts.toArray, tris.toArray)
  }

  private def optInt(n: JsonNode, field: String, dflt: Int = 0): Int =
    Option(n.get(field)).map(_.asInt).getOrElse(dflt)

  private def parseGlb(bytes: Array[Byte]): (String, Array[Array[Byte]]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.getInt // magic, checked by caller
    val version = b.getInt
    require(version == 2, s"GLB version $version unsupported")
    b.getInt // total length
    var json: String = null
    var bin: Array[Byte] = Array.emptyByteArray
    while (b.remaining() >= 8) {
      val len = b.getInt
      val typ = b.getInt
      val chunk = new Array[Byte](len)
      b.get(chunk)
      if (typ == 0x4e4f534a) json = new String(chunk, StandardCharsets.UTF_8)
      else if (typ == 0x004e4942) bin = chunk
    }
    require(json != null, "GLB has no JSON chunk")
    (json, Array(bin)) // GLB carries exactly one BIN chunk = buffer 0
  }

  /** Every buffer of a standalone .gltf, each decoded from its base64
    * `data:` URI (external .bin files stay unsupported — loudly). */
  private def dataUriBuffers(root: JsonNode): Array[Array[Byte]] = {
    val bufs = root.get("buffers")
    require(bufs != null && bufs.size > 0, "glTF has no buffers")
    (0 until bufs.size).map { i =>
      val uri = bufs.get(i).get("uri").asText
      require(uri.startsWith("data:"),
        s"external .gltf buffer file (buffer $i) unsupported (use GLB or a data: URI)")
      java.util.Base64.getDecoder.decode(uri.substring(uri.indexOf(',') + 1))
    }.toArray
  }

  def write(mesh: TriMesh, path: String): Unit = {
    val nv = mesh.verts.length / 3
    val posBytes = nv * 12
    val idxBytes = mesh.tris.length * 4
    val binLen = posBytes + idxBytes
    val xs = mesh.verts.grouped(3).toArray
    def minMax(i: Int) = (xs.map(_(i)).min.toFloat, xs.map(_(i)).max.toFloat)
    val (mins, maxs) = (0 to 2).map(minMax).unzip
    val json =
      s"""{"asset":{"version":"2.0"},"scene":0,"scenes":[{"nodes":[0]}],
         |"nodes":[{"mesh":0}],
         |"meshes":[{"primitives":[{"attributes":{"POSITION":1},"indices":0,"mode":4}]}],
         |"accessors":[
         | {"bufferView":0,"componentType":5125,"count":${mesh.tris.length},"type":"SCALAR"},
         | {"bufferView":1,"componentType":5126,"count":$nv,"type":"VEC3",
         |  "min":[${mins.mkString(",")}],"max":[${maxs.mkString(",")}]}],
         |"bufferViews":[
         | {"buffer":0,"byteOffset":0,"byteLength":$idxBytes},
         | {"buffer":0,"byteOffset":$idxBytes,"byteLength":$posBytes}],
         |"buffers":[{"byteLength":$binLen}]}""".stripMargin.replaceAll("\n", "")
    val jsonBytes0 = json.getBytes(StandardCharsets.UTF_8)
    val jsonPad = (4 - jsonBytes0.length % 4) % 4
    val jsonBytes = jsonBytes0 ++ Array.fill(jsonPad)(' '.toByte)
    val binPad = (4 - binLen % 4) % 4
    val total = 12 + 8 + jsonBytes.length + 8 + binLen + binPad
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(Magic).putInt(2).putInt(total)
    out.putInt(jsonBytes.length).putInt(0x4e4f534a).put(jsonBytes)
    out.putInt(binLen + binPad).putInt(0x004e4942)
    mesh.tris.foreach(out.putInt)
    mesh.verts.foreach(v => out.putFloat(v.toFloat))
    (0 until binPad).foreach(_ => out.put(0.toByte))
    Files.write(Paths.get(path), out.array())
  }
}
