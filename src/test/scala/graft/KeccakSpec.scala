package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Keccak256

/** Keccak-256 against published test vectors — the registry's topic0
  * derivation is only trustworthy if the primitive matches the spec.
  */
class KeccakSpec extends AnyFunSuite {
  test("empty string vector (the EVM empty codeHash constant)") {
    assert(Keccak256.hex("") ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }
  test("ERC-20 Transfer topic0 (the hash every EVM explorer shows)") {
    assert(Keccak256.hex("Transfer(address,address,uint256)") ===
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }
  test("multi-block message (crosses the 136-byte rate boundary)") {
    // 200 'a' chars: forces two absorb blocks
    assert(Keccak256.hex("a" * 200).length === 64)
    assert(Keccak256.hex("a" * 200) === Keccak256.hex("a" * 200))
    assert(Keccak256.hex("a" * 200) !== Keccak256.hex("a" * 199))
  }
}
