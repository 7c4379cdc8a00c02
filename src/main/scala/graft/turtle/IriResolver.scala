package graft.turtle

/** RFC 3987 IRI-reference syntax validation and RFC 3986 §5.2 strict
  * reference resolution.
  *
  * The reference library delegates both to the `iref` crate
  * (`src/lexing.rs:450-453` validation, `src/build.rs:111-132` resolution).
  * We hand-write them because `java.net.URI` deviates on abnormal cases
  * (empty references, `..` overflow, fragments against opaque bases) —
  * SURVEY.md §2.4 B4.
  */
object IriResolver {

  /** Parsed components per RFC 3986 §3. `authority`/`query`/`fragment`
    * distinguish absent (None) from empty (Some("")).
    */
  final case class Components(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String]) {

    def recompose: String = {
      val sb = new java.lang.StringBuilder
      scheme.foreach { s => sb.append(s).append(':') }
      authority.foreach { a => sb.append("//").append(a) }
      sb.append(path)
      query.foreach { q => sb.append('?').append(q) }
      fragment.foreach { f => sb.append('#').append(f) }
      sb.toString
    }
  }

  /** Split an IRI reference into components (RFC 3986 appendix B).
    * Pure splitting — never fails; validation is separate.
    */
  def parse(ref: String): Components = {
    var rest = ref
    var fragment: Option[String] = None
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { fragment = Some(rest.substring(hashIdx + 1)); rest = rest.substring(0, hashIdx) }
    var query: Option[String] = None
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) { query = Some(rest.substring(qIdx + 1)); rest = rest.substring(0, qIdx) }
    var scheme: Option[String] = None
    val colonIdx = rest.indexOf(':')
    if (colonIdx > 0) {
      val candidate = rest.substring(0, colonIdx)
      // a ':' before any '/' marks a scheme (appendix-B regex `([^:/?#]+):`)
      val slashIdx = rest.indexOf('/')
      if ((slashIdx < 0 || colonIdx < slashIdx) && isValidScheme(candidate)) {
        scheme = Some(candidate)
        rest = rest.substring(colonIdx + 1)
      }
    }
    var authority: Option[String] = None
    if (rest.startsWith("//")) {
      val after = rest.substring(2)
      val end0 = after.indexOf('/')
      val end = if (end0 < 0) after.length else end0
      authority = Some(after.substring(0, end))
      rest = after.substring(end)
    }
    Components(scheme, authority, rest, query, fragment)
  }

  def isValidScheme(s: String): Boolean =
    s.nonEmpty && isAlpha(s.charAt(0)) && s.forall(c =>
      isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** ucschar from RFC 3987 §2.2. */
  private def isUcschar(cp: Int): Boolean =
    (cp >= 0x00A0 && cp <= 0xD7FF) || (cp >= 0xF900 && cp <= 0xFDCF) ||
      (cp >= 0xFDF0 && cp <= 0xFFEF) ||
      (cp >= 0x10000 && cp <= 0xEFFFD && (cp & 0xFFFF) <= 0xFFFD &&
        !(cp >= 0xE0000 && cp <= 0xE0FFF))

  /** iprivate from RFC 3987 §2.2 (allowed in iquery). */
  private def isIprivate(cp: Int): Boolean =
    (cp >= 0xE000 && cp <= 0xF8FF) || (cp >= 0xF0000 && cp <= 0xFFFFD) ||
      (cp >= 0x100000 && cp <= 0x10FFFD)

  private def isIunreserved(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9') ||
      cp == '-' || cp == '.' || cp == '_' || cp == '~' || isUcschar(cp)

  private def isSubDelim(cp: Int): Boolean = cp match {
    case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' => true
    case _ => false
  }

  /** Validate one component's codepoints; `extra` lists additionally-allowed
    * ASCII chars; percent-escapes are validated inline.
    */
  private def validComponent(s: String, extra: String, allowPrivate: Boolean): Boolean = {
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      if (cp == '%') {
        if (k + 2 >= s.length || Character.digit(s.charAt(k + 1), 16) < 0 ||
            Character.digit(s.charAt(k + 2), 16) < 0) return false
        k += 3
      } else {
        if (!(isIunreserved(cp) || isSubDelim(cp) || extra.indexOf(cp) >= 0 ||
              (allowPrivate && isIprivate(cp)))) return false
        k += Character.charCount(cp)
      }
    }
    true
  }

  private def validAuthority(a: String): Boolean = {
    // [ iuserinfo "@" ] ihost [ ":" port ]
    val atIdx = a.lastIndexOf('@')
    val (userinfo, hostport) =
      if (atIdx >= 0) (Some(a.substring(0, atIdx)), a.substring(atIdx + 1)) else (None, a)
    if (userinfo.exists(u => !validComponent(u, ":", allowPrivate = false))) return false
    if (hostport.startsWith("[")) {
      // IP-literal: keep permissive — hex digits, ':', '.', and IPvFuture chars
      val close = hostport.indexOf(']')
      if (close < 0) return false
      val lit = hostport.substring(1, close)
      if (!lit.forall(c => Character.digit(c, 16) >= 0 || c == ':' || c == '.' || c == 'v' || c == 'V'))
        return false
      val after = hostport.substring(close + 1)
      after.isEmpty || (after.startsWith(":") && after.drop(1).forall(_.isDigit))
    } else {
      val colonIdx = hostport.lastIndexOf(':')
      val (host, port) =
        if (colonIdx >= 0 && hostport.substring(colonIdx + 1).forall(_.isDigit))
          (hostport.substring(0, colonIdx), Some(hostport.substring(colonIdx + 1)))
        else (hostport, None)
      val _ = port
      validComponent(host, "", allowPrivate = false)
    }
  }

  /** Syntax-validate an IRI reference (RFC 3987 `IRI-reference`).
    * Returns None when valid, or Some(reason).
    */
  def validateIriRef(ref: String): Option[String] = validateParsed(parse(ref))

  private def validateParsed(c: Components): Option[String] = {
    if (c.scheme.exists(!isValidScheme(_))) return Some("invalid scheme")
    if (c.authority.exists(!validAuthority(_))) return Some("invalid authority")
    // ipchar = iunreserved / pct-encoded / sub-delims / ":" / "@"  (+ "/" separators)
    if (!validComponent(c.path, ":@/", allowPrivate = false)) return Some("invalid path")
    // When there is no authority, a path may not begin with "//"
    if (c.authority.isEmpty && c.path.startsWith("//")) return Some("ambiguous path")
    // A relative reference's first segment may not contain ':'
    if (c.scheme.isEmpty) {
      val firstSeg = c.path.takeWhile(_ != '/')
      if (firstSeg.contains(':')) return Some("colon in first path segment")
    }
    if (c.query.exists(q => !validComponent(q, ":@/?", allowPrivate = true)))
      return Some("invalid query")
    if (c.fragment.exists(f => !validComponent(f, ":@/?", allowPrivate = false)))
      return Some("invalid fragment")
    None
  }

  /** True when the reference is an absolute IRI (has a scheme). */
  def isAbsolute(ref: String): Boolean = parse(ref).scheme.isDefined

  /** Validate as an absolute IRI (reference `Iri::new`, used for compact-IRI
    * expansion at `src/build.rs:147-152`).
    */
  def validateIri(iri: String): Option[String] = {
    // one component parse for both checks (was: validateIriRef + isAbsolute,
    // each re-parsing the same string)
    val c = parse(iri)
    validateParsed(c).orElse(if (c.scheme.isDefined) None else Some("missing scheme"))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments — cursor form: the naive
    * "rewrite the remaining input per rule" loop copies the whole tail on
    * every consumed segment (O(n²): a 1 MB path of short segments would
    * burn ~10¹¹ char copies in one task). An index over the ORIGINAL
    * string with one output builder is linear; the "/./x" → "/x" and
    * "/../x" → pop + "/x" rewrites fall out of advancing the cursor to the
    * following '/' instead of re-prefixing.
    */
  def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder
    val n = path.length
    var i = 0
    def at(s: String): Boolean = path.startsWith(s, i)
    def restIs(s: String): Boolean = n - i == s.length && path.startsWith(s, i)
    while (i < n) {
      if (at("../")) i += 3
      else if (at("./")) i += 2
      else if (at("/./")) i += 2 // leaves the trailing '/' as the next prefix
      else if (restIs("/.")) { out.append('/'); i = n }
      else if (at("/../")) { i += 3; popSegment(out) } // ditto
      else if (restIs("/..")) { popSegment(out); out.append('/'); i = n }
      else if (restIs(".") || restIs("..")) i = n
      else {
        // move the first segment (incl. leading '/') to the output
        var start = i
        if (path.charAt(i) == '/') start += 1
        val slash = path.indexOf('/', start)
        if (slash < 0) { out.append(path, i, n); i = n }
        else { out.append(path, i, slash); i = slash }
      }
    }
    out.toString
  }

  private def popSegment(out: java.lang.StringBuilder): Unit = {
    var k = out.length - 1
    while (k >= 0 && out.charAt(k) != '/') k -= 1
    out.setLength(math.max(k, 0))
  }

  /** RFC 3986 §5.2.3 merge. */
  private def merge(base: Components, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val idx = base.path.lastIndexOf('/')
      if (idx < 0) refPath else base.path.substring(0, idx + 1) + refPath
    }

  /** RFC 3986 §5.2.2 strict transform-references: resolve `ref` against
    * absolute `base`. Matches `iref::IriRef::resolved`, including
    * dot-segment removal on already-absolute references.
    */
  def resolve(ref: String, base: String): String =
    resolveAgainst(ref, parse(base))

  /** Resolution against a pre-parsed base (callers resolving many refs
    * against one base — e.g. the triple builder — parse it once).
    */
  def resolveAgainst(ref: String, b: Components): String = {
    val r = parse(ref)
    val t =
      if (r.scheme.isDefined)
        Components(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.authority.isDefined)
        Components(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Components(b.scheme, b.authority, b.path, if (r.query.isDefined) r.query else b.query, r.fragment)
      else if (r.path.startsWith("/"))
        Components(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Components(b.scheme, b.authority, removeDotSegments(merge(b, r.path)), r.query, r.fragment)
    t.recompose
  }
}
