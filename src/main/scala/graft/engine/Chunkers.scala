package graft.engine

/** Chunking strategies (`services/hierarchical_chunker.py:585-947` exposes
  * semantic/structural/hierarchical/hybrid modes; `processPDF.py` feeds the
  * structural path). Each strategy is a pure `String => Seq[ChunkPiece]`
  * function used inside `Ingest.chunk`'s flatMap — per-row, shuffle-free,
  * deterministic.
  */
object Chunkers {

  /** A produced piece; `parentSeq` links hierarchical children to their
    * parent chunk (None for top-level/flat pieces). */
  case class ChunkPiece(seq: Int, text: String, level: Int = 0, parentSeq: Option[Int] = None)

  trait Chunker extends Serializable {
    def chunk(content: String): Seq[ChunkPiece]
  }

  /** Fixed token window with overlap (the reference's default splitter,
    * token-budget-aware per embedding_model.py:192-208). */
  final class FixedWindowChunker(windowTokens: Int = 64, overlap: Int = 0) extends Chunker {
    require(overlap < windowTokens, "overlap must be < window")
    def chunk(content: String): Seq[ChunkPiece] = {
      val toks = content.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Nil
      else {
        val step = windowTokens - overlap
        toks.indices.by(step).takeWhile(_ < toks.length).zipWithIndex.map {
          case (s, i) => ChunkPiece(i, toks.slice(s, s + windowTokens).mkString(" "))
        }
      }
    }
  }

  /** Structural: split on sentence/paragraph boundaries, packing sentences
    * into chunks up to maxTokens (structural mode of the hierarchical
    * chunker). */
  final class StructuralChunker(maxTokens: Int = 64) extends Chunker {
    def chunk(content: String): Seq[ChunkPiece] = {
      val sentences = content.split("(?<=[.!?])\\s+|\\n\\n+").filter(_.trim.nonEmpty)
      if (sentences.isEmpty) Nil
      else {
        val packed = sentences.foldLeft(Vector(Vector.empty[String])) { (acc, s) =>
          val cur = acc.last
          val curTokens = cur.map(_.split("\\s+").length).sum
          if (cur.nonEmpty && curTokens + s.split("\\s+").length > maxTokens)
            acc :+ Vector(s)
          else acc.init :+ (cur :+ s)
        }.filter(_.nonEmpty)
        packed.zipWithIndex.map { case (ss, i) => ChunkPiece(i, ss.mkString(" ")) }
      }
    }
  }

  /** Hierarchical: coarse parent chunks plus fine child chunks linked by
    * parentSeq — retrieval hits children, hydration returns parents
    * (hierarchical mode). */
  final class HierarchicalChunker(parentTokens: Int = 128, childTokens: Int = 32) extends Chunker {
    require(childTokens < parentTokens)
    def chunk(content: String): Seq[ChunkPiece] = {
      val parents = new FixedWindowChunker(parentTokens).chunk(content)
      val out = Vector.newBuilder[ChunkPiece]
      var seq = 0
      parents.foreach { p =>
        val parentSeq = seq
        out += ChunkPiece(parentSeq, p.text, level = 0); seq += 1
        new FixedWindowChunker(childTokens).chunk(p.text).foreach { c =>
          out += ChunkPiece(seq, c.text, level = 1, parentSeq = Some(parentSeq)); seq += 1
        }
      }
      out.result()
    }
  }

  /** Hybrid: structural first; any piece still over maxTokens is re-split by
    * fixed window (hybrid mode). */
  final class HybridChunker(maxTokens: Int = 64) extends Chunker {
    private val structural = new StructuralChunker(maxTokens)
    private val window = new FixedWindowChunker(maxTokens)
    def chunk(content: String): Seq[ChunkPiece] = {
      val pieces = structural.chunk(content).flatMap { p =>
        if (p.text.split("\\s+").length <= maxTokens) Seq(p.text)
        else window.chunk(p.text).map(_.text)
      }
      pieces.zipWithIndex.map { case (t, i) => ChunkPiece(i, t) }
    }
  }
}
