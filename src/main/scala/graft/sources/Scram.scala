package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (RFC 5802 framing + RFC 7677 hash suite) —
  * the auth method PostgreSQL requires by default since v14
  * (`password_encryption = scram-sha-256`). The reference inherits this
  * from pgx (`go.mod`; connection password consumed at
  * `spi/config/configuration.go` PostgreSQL config); here the exchange
  * is implemented directly against the public RFCs so
  * [[PgReplicationClient]] can authenticate on the replication socket.
  *
  * Both halves live here on purpose: the client side (proof) drives the
  * real handshake, and the verifier side (StoredKey/ServerKey checks)
  * drives the spec's fake walsender — the same keys, used from opposite
  * ends, which is exactly how the RFC defines mutual authentication.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  /** Channel-binding variant (RFC 5802 §6.1 naming): same exchange with
    * the RFC 5929 tls-server-end-point data appended to the c= gs2
    * block. PostgreSQL advertises it on SSL connections. */
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  def h(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  /** RFC 3454 B.1 "mapped to nothing" — characters NFKC does NOT remove
    * (soft hyphen, ZWNJ/ZWJ, variation selectors, BOM); stripping them
    * first is what makes the client's SaltedPassword match the verifier
    * the server stored at CREATE ROLE time. U+200B is deliberately NOT
    * here despite being in B.1: it is ALSO in C.1.2, and pg_saslprep's
    * map step checks the space table first — the server turns it into a
    * space, so deleting it here would salt a different string. */
  private def mapsToNothing(cp: Int): Boolean = cp match {
    case 0x00AD | 0x034F | 0x1806 | 0x200C | 0x200D | 0x2060 | 0xFEFF => true
    case _ => (cp >= 0x180B && cp <= 0x180D) || (cp >= 0xFE00 && cp <= 0xFE0F)
  }

  /** RFC 3454 C.1.2 non-ASCII space — SASLprep maps these to U+0020.
    * Exactly pg_saslprep's non_ascii_space_ranges: 2000–200B inclusive
    * (the zero-width space IS space-mapped), and NOT the line/paragraph
    * separators 2028/2029 — those are C.2.2 controls, whose prohibited
    * verdict must reach the scan below for the raw fallback to match
    * the server's. */
  private def nonAsciiSpace(cp: Int): Boolean = cp match {
    case 0x00A0 | 0x1680 | 0x202F | 0x205F | 0x3000 => true
    case _ => cp >= 0x2000 && cp <= 0x200B
  }

  /** RFC 5802 §2.2 requires Normalize(password) = SASLprep (RFC 4013).
    * PostgreSQL SASLpreps passwords at CREATE ROLE time, so a client
    * that skips normalization computes a different SaltedPassword for
    * any non-ASCII password (composed vs decomposed Unicode) and fails
    * auth against a real server.
    *
    * Steps, matching the server's pg_saslprep: (1) map — B.1 code
    * points removed, C.1.2 non-ASCII spaces → space; (2) NFKC;
    * (3) prohibited-output scan over CODE POINTS (the full RFC 3454
    * C.2–C.9 tables — including supplementary-plane code points that
    * surface as surrogate pairs in UTF-16 — plus unpaired surrogates);
    * (4) the §6 bidi rule. On prohibited input the result is the RAW
    * password unchanged: pg_saslprep returns the original string when
    * SASLprep fails, on both libpq and the server, so throwing here
    * would reject a password that authenticates fine everywhere else —
    * and normalizing where the server fell back to raw would salt a
    * DIFFERENT string than the stored verifier. */
  def normalize(password: String): String = {
    val mapped = new java.lang.StringBuilder(password.length)
    password.codePoints().forEach { cp =>
      if (nonAsciiSpace(cp)) mapped.append(' ')
      else if (!mapsToNothing(cp)) mapped.appendCodePoint(cp)
    }
    val n = java.text.Normalizer.normalize(mapped, java.text.Normalizer.Form.NFKC)
    var prohibited = false
    n.codePoints().forEach { cp =>
      if (prohibitedOutput(cp)) prohibited = true
    }
    if (prohibited || bidiViolation(n)) password else n
  }

  /** RFC 3454 prohibited-output tables as pg_saslprep checks them
    * (C.1.2 was mapped to space above; the rest must match the SERVER's
    * verdict exactly — a character we pass but PostgreSQL flags, or
    * vice versa, makes the two sides salt DIFFERENT strings and auth
    * fails for a password libpq accepts):
    * C.2.1/C.2.2 controls (getType CONTROL covers 00-1F, 7F-9F; the
    * C.2.2 formatting singletons are listed), C.3 private use, C.4
    * noncharacters, C.5 surrogates, C.6 inappropriate-for-plain-text,
    * C.7 ideographic description, C.8 change-display/deprecated, C.9
    * tagging. */
  private def prohibitedOutput(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.CONTROL || t == Character.UNASSIGNED ||
    t == Character.SURROGATE || t == Character.PRIVATE_USE ||
    cp == 0x06DD || cp == 0x070F || cp == 0x180E ||                 // C.2.2
    cp == 0x2028 || cp == 0x2029 || (cp >= 0x2060 && cp <= 0x2063) ||
    (cp >= 0x206A && cp <= 0x206F) || cp == 0xFEFF ||
    (cp >= 0x1D173 && cp <= 0x1D17A) ||
    (cp >= 0xFDD0 && cp <= 0xFDEF) || (cp & 0xFFFE) == 0xFFFE ||    // C.4
    (cp >= 0xFFF9 && cp <= 0xFFFD) ||                               // C.6
    (cp >= 0x2FF0 && cp <= 0x2FFB) ||                               // C.7
    cp == 0x0340 || cp == 0x0341 || cp == 0x200E || cp == 0x200F || // C.8
    (cp >= 0x202A && cp <= 0x202E) ||
    cp == 0xE0001 || (cp >= 0xE0020 && cp <= 0xE007F) ||            // C.9
    // RFC 3454's unassigned table (A.1) is frozen at Unicode 3.2, but
    // Character.getType reflects the RUNNING JVM's Unicode version —
    // code points assigned after 3.2 read as assigned here while
    // pg_saslprep flags them (→ raw fallback on the server). The
    // SUPPLEMENTARY planes pin to the 3.2 verdict exactly: in 3.2,
    // plane 1 carried only Old Italic/Gothic/Deseret and the
    // musical/math-alphanumeric blocks, plane 2 only CJK ext B and the
    // compat block, plane 14 only the C.9 tags — everything else
    // (emoji, cuneiform, hieroglyphs, CJK C–G, variation selectors) is
    // prohibited-as-unassigned on the server. KNOWN DEVIATION: BMP
    // scripts assigned after 3.2 (e.g. NKo, Sundanese) still follow the
    // JVM's verdict — transcribing A.1's ~400 BMP ranges without the
    // authoritative table risks worse.
    (cp >= 0x10000 && cp <= 0x1FFFF && !assignedInU32Plane1(cp)) ||
    (cp >= 0x2A6D7 && cp <= 0x2F7FF) || (cp >= 0x2FA1E && cp <= 0x2FFFF) ||
    (cp >= 0x30000 && cp <= 0xDFFFF) ||
    (cp >= 0xE0100 && cp <= 0xE01EF)
  }

  /** The plane-1 blocks Unicode 3.2 had assigned (everything else in
    * the plane was A.1-unassigned): Old Italic, Gothic, Deseret,
    * Byzantine/Western musical symbols, mathematical alphanumerics. */
  private def assignedInU32Plane1(cp: Int): Boolean =
    (cp >= 0x10300 && cp <= 0x1034F) || (cp >= 0x10400 && cp <= 0x1044F) ||
    (cp >= 0x1D000 && cp <= 0x1D1FF) || (cp >= 0x1D400 && cp <= 0x1D7FF)

  /** RFC 3454 §6 bidi rule (pg_saslprep enforces it): a string with any
    * RandALCat character may contain no LCat character and must both
    * start and end RandALCat. Violation → SASLprep fails → raw
    * password, same as the prohibited tables. */
  private def bidiViolation(s: String): Boolean = {
    val cps = s.codePoints().toArray
    def isR(cp: Int): Boolean = {
      val d = Character.getDirectionality(cp)
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC
    }
    def isL(cp: Int): Boolean =
      Character.getDirectionality(cp) == Character.DIRECTIONALITY_LEFT_TO_RIGHT
    cps.nonEmpty && cps.exists(isR) &&
      (cps.exists(isL) || !isR(cps.head) || !isR(cps.last))
  }

  /** Hi(Normalize(str), salt, i) — PBKDF2-HMAC-SHA-256, RFC 5802 §2.2. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(normalize(password).toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "scram: xor length mismatch")
    a.indices.map(i => (a(i) ^ b(i)).toByte).toArray
  }

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key".getBytes(UTF_8))
  def storedKey(clientKey: Array[Byte]): Array[Byte] = h(clientKey)
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key".getBytes(UTF_8))

  def clientProof(salted: Array[Byte], authMessage: String): Array[Byte] = {
    val ck = clientKey(salted)
    xor(ck, hmac(storedKey(ck), authMessage.getBytes(UTF_8)))
  }

  def serverSignature(salted: Array[Byte], authMessage: String): Array[Byte] =
    hmac(serverKey(salted), authMessage.getBytes(UTF_8))

  /** Verifier side (the fake walsender / any server): recover ClientKey
    * from the proof and check H(ClientKey) == StoredKey — RFC 5802 §3's
    * server verification, the same check a real PostgreSQL performs
    * against pg_authid's stored verifier. */
  def verifyClientProof(proof: Array[Byte], stored: Array[Byte],
                        authMessage: String): Boolean = {
    val recovered = xor(proof, hmac(stored, authMessage.getBytes(UTF_8)))
    MessageDigest.isEqual(h(recovered), stored)
  }

  def b64(bytes: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(bytes)
  def unb64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  /** `k=v,k=v` attribute list (server-first / server-final messages).
    * Values may themselves contain '=' (base64 padding) — split on the
    * FIRST '=' only. */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      require(kv.charAt(1) == '=', s"scram: malformed attribute '$kv'")
      kv.charAt(0) -> kv.substring(2)
    }.toMap

  final case class ServerFirst(nonce: String, salt: Array[Byte], iterations: Int)

  def parseServerFirst(msg: String): ServerFirst = {
    val a = attrs(msg)
    require(!a.contains('m'), "scram: mandatory extensions not supported")
    ServerFirst(
      a.getOrElse('r', throw new IllegalArgumentException("scram: server-first missing r=")),
      unb64(a.getOrElse('s', throw new IllegalArgumentException("scram: server-first missing s="))),
      a.getOrElse('i', throw new IllegalArgumentException("scram: server-first missing i=")).toInt)
  }

  def nonce(bytes: Int = 18): String = {
    val b = new Array[Byte](bytes)
    new java.security.SecureRandom().nextBytes(b)
    b64(b)
  }
}
