package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels for the dedup hot paths. */
object TextExpressions {

  /** Word n-grams in ONE pass. Bit-identical to the HOF spelling in
    * [[graft.ext.Dedup]] history —
    * `transform(sequence(...), i => concat_ws(" ", slice(split(trim(s),"\\s+"), i, n)))`
    * — which allocates a token array, an index array, and a slice per n-gram
    * per row. Semantics replicated exactly (oracle-compat): Spark `trim`
    * removes only 0x20 spaces; Spark `split(str, re)` is Java
    * `Pattern.split(str, -1)` (leading separator yields an empty first
    * token, trailing empties kept); fewer than `n` tokens → empty array. */
  object NgramKernel {
    private val WS = java.util.regex.Pattern.compile("\\s+")

    private def trimSpaces(s: String): String = {
      var b = 0
      var e = s.length
      while (b < e && s.charAt(b) == ' ') b += 1
      while (e > b && s.charAt(e - 1) == ' ') e -= 1
      if (b == 0 && e == s.length) s else s.substring(b, e)
    }

    def ngrams(s: UTF8String, n: Int): ArrayData = {
      val toks = WS.split(trimSpaces(s.toString), -1)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    /** XXH64(seed 42) of each n-gram's UTF-8 bytes, same tokenization as
      * [[ngrams]] — set operations over `long`s instead of ~20-char strings
      * (an engine-internal representation: set SIZES are what surface, and
      * they equal the string-set sizes absent 64-bit collisions, odds
      * ~k²/2⁶⁵ per doc pair). One UTF-8 encode per gram, no UTF8String
      * allocation, no string shuffle. */
    def ngramHashes(s: UTF8String, n: Int): ArrayData = {
      val toks = WS.split(trimSpaces(s.toString), -1)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val b = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "ngram width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"
    override protected def nullSafeEval(input: Any): Any =
      NgramKernel.ngrams(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions$$NgramKernel$$.MODULE$$.ngrams($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordNgrams =
      copy(child = newChild)
  }

  case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "ngram width must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "word_ngram_hashes"
    override protected def nullSafeEval(input: Any): Any =
      NgramKernel.ngramHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions$$NgramKernel$$.MODULE$$.ngramHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graft.Bridge
  def wordNgrams(text: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(text), n))

  def wordNgramHashes(text: Column, n: Int): Column =
    Bridge.column(WordNgramHashes(Bridge.expression(text), n))
}
