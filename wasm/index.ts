/**
 * TypeScript wrapper over libcrackle.wasm (reference parity:
 * wasm/index.ts:47-185 there — header introspection + typed-array
 * compress/decompress round trips).
 *
 * Usage:
 *   import createCrackleModule from "./libcrackle.js";
 *   const crackle = await Crackle.create();
 *   const labels = crackle.decompress(ckl);            // TypedArray
 *   const bytes = crackle.compress(labels, sx, sy, sz); // Uint8Array
 */

declare function createCrackleModule(): Promise<any>;

export interface CrackleShape {
  sx: number;
  sy: number;
  sz: number;
  dataWidth: number;
  nbytes: number;
}

type LabelArray = Uint8Array | Uint16Array | Uint32Array
  | BigUint64Array;

export class Crackle {
  private constructor(private mod: any) {}

  static async create(): Promise<Crackle> {
    return new Crackle(await createCrackleModule());
  }

  /** Parse the 29-byte header of a .ckl stream. */
  shape(buf: Uint8Array): CrackleShape {
    const m = this.mod;
    const pb = m._malloc(buf.length);
    m.HEAPU8.set(buf, pb);
    const po = m._malloc(5 * 8);
    const rc = m._crackle_query(pb, BigInt(buf.length), po);
    if (rc < 0) {
      m._free(pb); m._free(po);
      throw new Error("crackle: malformed header");
    }
    const g = (i: number) =>
      Number(m.getValue(po + 8 * i, "i64"));
    const out = {
      sx: g(0), sy: g(1), sz: g(2), dataWidth: g(3), nbytes: g(4),
    };
    m._free(pb); m._free(po);
    return out;
  }

  /** Decompress a full stream to a typed array (fortran order). */
  decompress(buf: Uint8Array): LabelArray {
    const m = this.mod;
    const s = this.shape(buf);
    const pb = m._malloc(buf.length);
    m.HEAPU8.set(buf, pb);
    const pout = m._malloc(s.nbytes);
    const rc = m._crackle_decompress(
      pb, BigInt(buf.length), pout, BigInt(s.nbytes));
    if (rc < 0) {
      m._free(pb); m._free(pout);
      throw new Error(`crackle: decompress failed (${rc})`);
    }
    const raw = m.HEAPU8.slice(pout, pout + s.nbytes);
    m._free(pb); m._free(pout);
    const n = s.nbytes / s.dataWidth;
    switch (s.dataWidth) {
      case 1: return new Uint8Array(raw.buffer, 0, n);
      case 2: return new Uint16Array(raw.buffer, 0, n);
      case 4: return new Uint32Array(raw.buffer, 0, n);
      default: return new BigUint64Array(raw.buffer, 0, n);
    }
  }

  /** Compress an F-order flat label volume. */
  compress(labels: LabelArray, sx: number, sy: number,
           sz: number): Uint8Array {
    const m = this.mod;
    const dw = labels.BYTES_PER_ELEMENT;
    const nb = labels.length * dw;
    const pin = m._malloc(nb);
    m.HEAPU8.set(
      new Uint8Array(labels.buffer, labels.byteOffset, nb), pin);
    const pptr = m._malloc(8);
    const len = Number(m._crackle_compress(
      pin, dw, BigInt(sx), BigInt(sy), BigInt(sz), pptr));
    if (len < 0) {
      m._free(pin); m._free(pptr);
      throw new Error(`crackle: compress failed (${len})`);
    }
    const pout = m.getValue(pptr, "i32");
    const out = m.HEAPU8.slice(pout, pout + len);
    m._crackle_free(pout);
    m._free(pin); m._free(pptr);
    return out;
  }
}
