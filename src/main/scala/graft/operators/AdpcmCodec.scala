package graft.operators

/** Pure-JVM IMA ADPCM decoder for the WAVE container (format tag
  * 0x0011, "DVI/IMA ADPCM" — public format: IMA Digital Audio Pack,
  * also specified in Microsoft's multimedia registration of wave
  * format tags; no reference-repo analog — the reference pipeline has
  * no audio code at all). This is the second REAL compressed-audio
  * codec behind [[Multimodal.decodeMedia]] after [[FlacCodec]]:
  * 4 bits/sample adaptive differential PCM, decoded nibble-by-nibble
  * through the published 89-entry step-size table.
  *
  * Block layout (the WAVE mapping): the `data` chunk is a sequence of
  * `blockAlign`-byte blocks. Each block opens with a 4-byte header per
  * channel — int16 LE initial predictor (which IS output sample 0),
  * uint8 step-table index, one reserved byte — followed by the coded
  * nibbles in 4-byte channel-interleaved words: 4 bytes (8 nibbles,
  * LOW nibble first) for channel 0, then 4 bytes for channel 1, ...,
  * repeating. samplesPerBlock = (blockAlign - 4*channels)*2/channels + 1.
  *
  * The input is UNTRUSTED: header fields are range-checked (index
  * <= 88, blockAlign large enough for its own headers), a trailing
  * partial block decodes only the whole channel-words it actually
  * contains, and the total decoded-sample budget is capped at
  * [[FlacCodec.MaxDecodeSamples]] — the same decompression-bomb guard
  * as the other media decoders. Malformed payloads degrade to
  * `decoded=false`; they never kill the executor task.
  */
object AdpcmCodec {

  /** IMA ADPCM step-size table (89 entries, published in the IMA ADPCM
    * reference algorithm). */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble magnitude (sign bit excluded). */
  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable per-channel codec state. The encoder advances it through
    * the DECODER update, so both sides track the identical
    * reconstruction — that is what makes the in-test round-trip
    * exact. */
  final class State(var pred: Int, var index: Int)

  /** Decode one nibble against `st`, returning the reconstructed
    * sample and advancing the state. Reference IMA decode step:
    * diff = (step>>3) + selected step fractions, sign from bit 3. */
  def decodeNibble(st: State, nib: Int): Int = {
    val step = StepTable(st.index)
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    if ((nib & 8) != 0) diff = -diff
    st.pred = math.max(-32768, math.min(32767, st.pred + diff))
    st.index = math.max(0, math.min(88, st.index + IndexTable(nib & 7)))
    st.pred
  }

  /** Encode one 16-bit sample against `st` (reference IMA quantizer),
    * advancing the state through [[decodeNibble]] so encoder and
    * decoder reconstructions stay bit-identical. Test-support surface:
    * production only decodes, but the encoder lives here (not in the
    * spec) so the two halves can never drift apart. */
  def encodeNibble(st: State, sample: Int): Int = {
    val step = StepTable(st.index)
    var diff = sample - st.pred
    var nib = 0
    if (diff < 0) { nib = 8; diff = -diff }
    if (diff >= step) { nib |= 4; diff -= step }
    if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) nib |= 1
    decodeNibble(st, nib)
    nib
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Decode an IMA-ADPCM `data` chunk. Returns
    * (n_samples per channel, floor(mean |amplitude| over ALL decoded
    * samples)) or None on malformed layout — the same stat contract as
    * [[Multimodal.decodeWav]]'s PCM path, so the two container paths
    * are interchangeable downstream. */
  def decodeData(b: Array[Byte], off: Int, len: Int, channels: Int,
      blockAlign: Int): Option[(Long, Long)] = {
    if (channels < 1 || channels > 8) return None
    if (blockAlign < 4 * channels + 4 * channels) return None
    // nibble payload must pack whole per-channel 4-byte words
    if ((blockAlign - 4 * channels) % (4 * channels) != 0) return None
    val budget = FlacCodec.MaxDecodeSamples
    var nPerChannel = 0L
    var sum = 0L
    var count = 0L
    val states = Array.fill(channels)(new State(0, 0))
    var blockOff = off
    val end = off + math.min(len, b.length - off)
    while (blockOff + 4 * channels <= end) {
      val blockEnd = math.min(blockOff + blockAlign, end)
      var c = 0
      while (c < channels) {
        val h = blockOff + 4 * c
        val pred = le16(b, h).toShort.toInt
        val idx = b(h + 2) & 0xff
        if (idx > 88) return None
        states(c).pred = pred
        states(c).index = idx
        sum += math.abs(pred) // header sample IS output sample 0
        count += 1
        c += 1
      }
      nPerChannel += 1
      if (count > budget) return None
      // channel-interleaved 4-byte words until the block (or buffer) ends
      var p = blockOff + 4 * channels
      while (p + 4 * channels <= blockEnd) {
        var ch = 0
        while (ch < channels) {
          val w = p + 4 * ch
          var i = 0
          while (i < 4) {
            val byte = b(w + i) & 0xff
            sum += math.abs(decodeNibble(states(ch), byte & 0xf))
            sum += math.abs(decodeNibble(states(ch), byte >> 4))
            i += 1
          }
          ch += 1
        }
        count += 8L * channels
        if (count > budget) return None
        p += 4 * channels
      }
      nPerChannel += (p - blockOff - 4 * channels) / channels * 2
      blockOff += blockAlign
    }
    if (nPerChannel == 0) None
    else Some((nPerChannel,
      if (count == 0) 0L else Math.floorDiv(sum, count)))
  }
}
