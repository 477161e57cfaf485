package graft

import java.security.MessageDigest

/** Canonical result hashing shared by Verify and DetCheck — ONE definition
  * so a DetCheck drift is directly comparable against Verify's hashes.json.
  * Values are canonicalized explicitly (hex byte arrays, deep collections,
  * nested Rows) because Row.toString renders arrays via JVM identity — a
  * binary column would otherwise hash differently every run. Rows are
  * length-delimited into the digest: concatenation alone would let distinct
  * row sets (["ab","c"] vs ["a","bc"]) collide and mask drift. */
object ResultHash {
  def canonValue(v: Any): String = v match {
    case null => "NULL"
    case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
    case a: Array[_] => a.iterator.map(canonValue).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] =>
      s.iterator.map(canonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.iterator.map { case (k, x) => canonValue(k) + "->" + canonValue(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canonValue).mkString("(", ",", ")")
    case x => x.toString
  }

  def hash(rows: Array[org.apache.spark.sql.Row]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    rows.map(canonValue).sorted.foreach { r =>
      val b = r.getBytes("UTF-8")
      md.update(s"${b.length}:".getBytes("UTF-8")) // length prefix = delimiter
      md.update(b)
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
