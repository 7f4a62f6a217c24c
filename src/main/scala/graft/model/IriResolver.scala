package graft.model

/** RFC 3986 §5 reference resolution for SPARQL `BASE` (spec §4.1.1) and
  * Turtle `@base` (Turtle spec §6.3).
  *
  * Absoluteness is decided by the scheme production
  * `ALPHA *(ALPHA / DIGIT / "+" / "-" / ".") ":"` — so `mailto:`, `did:`,
  * `tag:`, `data:` and `file:` IRIs pass through untouched (previously a
  * `://`-sniff wrongly concatenated non-authority schemes onto BASE), and
  * relative references follow the §5.2 transform — `/`-rooted refs replace
  * the base path, `?`/`#` refs keep it, and `../` segments merge via
  * remove_dot_segments — instead of plain string concatenation.
  */
object IriResolver {
  private val Scheme = "^[A-Za-z][A-Za-z0-9+.\\-]*:".r

  /** Does `ref` start with a scheme (RFC 3986 §3.1)? */
  def isAbsolute(ref: String): Boolean = Scheme.findPrefixOf(ref).isDefined

  /** Resolve `ref` against `base` (RFC 3986 §5.2.2 transform references).
    * Empty base or an absolute `ref` returns `ref` unchanged.
    */
  def resolve(base: String, ref: String): String = {
    if (base.isEmpty || isAbsolute(ref)) return ref
    val schemeEnd = base.indexOf(':')
    if (schemeEnd < 0) return base + ref // malformed base: legacy concat
    val scheme = base.substring(0, schemeEnd + 1)
    val rest0 = base.substring(schemeEnd + 1)
    val (authority, rest1) =
      if (rest0.startsWith("//")) {
        val e = rest0.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
        if (e < 0) (rest0, "") else (rest0.substring(0, e), rest0.substring(e))
      } else ("", rest0)
    // base path+query (fragment always dropped), and path alone
    val pathQ = { val h = rest1.indexOf('#'); if (h < 0) rest1 else rest1.substring(0, h) }
    val path = { val q = pathQ.indexOf('?'); if (q < 0) pathQ else pathQ.substring(0, q) }
    if (ref.isEmpty) scheme + authority + pathQ
    else if (ref.startsWith("//")) scheme + ref
    else if (ref.startsWith("#")) scheme + authority + pathQ + ref
    else if (ref.startsWith("?")) scheme + authority + path + ref
    else if (ref.startsWith("/")) scheme + authority + removeDotSegments(ref)
    else {
      // §5.2.3 merge: ref replaces the base path's last segment
      val merged =
        if (path.isEmpty && authority.nonEmpty) "/" + ref
        else path.substring(0, path.lastIndexOf('/') + 1) + ref
      scheme + authority + removeDotSegments(merged)
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val e = in.indexOf('/', 1)
        if (e < 0) { out += in; in = "" }
        else { out += in.substring(0, e); in = in.substring(e) }
      }
    }
    out.mkString
  }
}
