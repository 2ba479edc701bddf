package graft.functions

/** Keccak-256 (the pre-NIST padding variant Ethereum uses for event topic
  * hashes) — implemented from the public Keccak specification so the log
  * decode registry (graft.plans.LogSchemaRegistry) can derive each event's
  * `topic0 = keccak256(signature)` instead of hard-coding magic constants.
  * The reference gets the same hashes from web3's ABI machinery
  * (scan_events_txs.py:144 `_decode_logs` dispatches on them).
  *
  * Driver-side only (registry construction at class-init time); never on
  * the per-row hot path — row-level decoding compares pre-computed topic0
  * strings.
  */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y] from the Keccak reference tables
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        x += 1
      }
      var i = 0
      while (i < 25) { a(i) ^= d(i % 5); i += 1 }
      // rho + pi: B[y, 2x+3y] = rot(A[x,y])
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** 32-byte Keccak-256 digest (rate 1088 / capacity 512, multi-rate
    * padding 0x01…0x80 — NOT the SHA-3 0x06 variant). */
  def hash(msg: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    // pad
    val padLen = rate - (msg.length % rate)
    val padded = java.util.Arrays.copyOf(msg, msg.length + padLen)
    padded(msg.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    // absorb (lanes little-endian)
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) {
          lane = (lane << 8) | (padded(off + 8 * i + j) & 0xffL)
          j -= 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    // squeeze first 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(8 * i + j) = ((state(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  /** lowercase hex digest of a UTF-8 string, e.g. an event signature */
  def hex(s: String): String =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
}
