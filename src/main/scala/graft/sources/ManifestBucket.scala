package graft.sources

/** Hash-bucket partition transforms for manifest tables — the
  * Iceberg `bucket(n, col)` shape (beyond-reference engine row; the
  * public Iceberg partition-transform spec is the model): a
  * HIGH-NDV key column cannot
  * hive-partition by value (millions of directories), but
  * `bucket(n, col)` folds it into n stable partitions whose ids are
  * exact `#pval=` metadata — two tables bucketed the SAME way on
  * their join keys then storage-partition join with ZERO exchange,
  * and point predicates (`k = v`, `k IN (...)`) prune to the one
  * bucket that can hold them. The shuffle happened once at write
  * time and is amortized over every subsequent join — the single
  * biggest lever for a 100 TB fact table joined daily.
  *
  * SPEC SYNTAX: a partition-spec entry is either a plain column name
  * (identity / hive-style value partitioning) or `bucket(n,col)`.
  * One canonical string form rides the existing partition-spec
  * plumbing end-to-end (the `partitionColumns` option, the catalog
  * marker's `partition=` line, `PARTITIONED BY (bucket(16, k))`
  * transforms), and the per-file `#pval=` value is encoded
  * `B<n>:<id>` — so snapshots reconstruct their bucket spec from
  * metadata alone and appends inherit it without restating.
  *
  * THE HASH IS PART OF THE ON-DISK FORMAT: write-side routing,
  * point-predicate pruning, and the catalog's SQL `bucket` function
  * (the SPJ seam) must all agree, forever. int64-kind columns
  * (integer/date/timestamp, in their `#stats=` encodings) hash by
  * the splitmix64 finalizer; strings by FNV-1a 64 over UTF-8 bytes
  * followed by the same finalizer. Bucket id = floorMod(hash, n).
  * NULL keys keep the identity convention (`N` — their own
  * partition, pruned under any point predicate). */
object ManifestBucket {

  private val Rx = """(?i)^bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)$""".r

  /** Parse one spec entry: (underlying column, bucket count). */
  def parse(spec: String): (String, Option[Int]) = spec.trim match {
    case Rx(n, c) =>
      require(n.toInt > 0, s"bucket count must be positive: $spec")
      (c, Some(n.toInt))
    case c => (c, None)
  }

  def column(spec: String): String = parse(spec)._1

  def render(col: String, buckets: Option[Int]): String =
    buckets.map(n => s"bucket($n,$col)").getOrElse(col)

  /** Split a comma-separated partition-spec list, respecting the
    * parentheses of `bucket(n,col)` entries (a plain split on ','
    * would cut them in half). */
  def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += cur.toString; cur.setLength(0)
      case ch =>
        if (ch == '(') depth += 1
        else if (ch == ')') depth -= 1
        cur.append(ch)
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** splitmix64 finalizer — the canonical int64-key hash. */
  def hashLong(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over the bytes, splitmix-finalized — the canonical
    * string-key hash. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    hashLong(h)
  }

  def idOf(hash: Long, n: Int): Int =
    java.lang.Math.floorMod(hash, n.toLong).toInt

  def idOfLong(v: Long, n: Int): Int = idOf(hashLong(v), n)
  def idOfBytes(b: Array[Byte], n: Int): Int = idOf(hashBytes(b), n)

  /** The `B<n>:<id>` pval encoding. */
  def encode(n: Int, id: Int): String = s"B$n:$id"

  /** Decode a `B<n>:<id>` pval value → (buckets, id). */
  def decode(enc: String): Option[(Int, Int)] =
    if (!enc.startsWith("B")) None
    else enc.indexOf(':') match {
      case i if i > 1 =>
        try Some((enc.substring(1, i).toInt,
          enc.substring(i + 1).toInt))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
}
