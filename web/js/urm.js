/**
 * Dependency-free GameURM forward pass in plain JS (offline fallback, same
 * role as web/js/mlp.js for the MLP family). Consumes the
 * tpu2048-urm-weights-v1 artifact from tpu2048/train/export.py and mirrors
 * tpu2048/models/urm.py:apply (reference game.py:1355-1458):
 *   per-cell stem Linear(3->h, no bias) + LayerNorm + SiLU;
 *   num_loops recurrent passes of  h += emb;  then per block:
 *     h = RMSNorm(h + MHA(h));  h = RMSNorm(h + ConvSwiGLU(h));
 *   mean-pool over the 16 cells; biased action/value heads.
 * Dropout and truncated-loop gradient stopping are training-only.
 *
 * All state is a flat Float32Array of shape (16, dim) row-major — 16 cells
 * is small enough that clarity beats blocking.
 */
"use strict";

const URM_CELLS = 16;

/** y(L,out) = x(L,in) @ W(out,in)^T, rows independent. */
function urmMatmul(W, x, L) {
  const [out, inn] = W.shape;
  const w = W.data;
  const y = new Float32Array(L * out);
  for (let l = 0; l < L; l++) {
    for (let o = 0; o < out; o++) {
      let acc = 0;
      const xr = l * inn, wr = o * inn;
      for (let i = 0; i < inn; i++) acc += x[xr + i] * w[wr + i];
      y[l * out + o] = acc;
    }
  }
  return y;
}

function silu(v) {
  return v / (1 + Math.exp(-v));
}

/** In-place parameter-free RMSNorm over each row of x(L,d). */
function urmRmsNorm(x, L, d, eps) {
  for (let l = 0; l < L; l++) {
    let ss = 0;
    const r = l * d;
    for (let i = 0; i < d; i++) ss += x[r + i] * x[r + i];
    const inv = 1 / Math.sqrt(ss / d + eps);
    for (let i = 0; i < d; i++) x[r + i] *= inv;
  }
}

class PureJsURM {
  constructor(doc) {
    if (doc.format !== "tpu2048-urm-weights-v1") {
      throw new Error(`unsupported weights format: ${doc.format}`);
    }
    this.cfg = doc.config;
    const d = decodeTensor; // from mlp.js
    this.stem = { w: d(doc.stem.w), g: d(doc.stem.ln_g), b: d(doc.stem.ln_b) };
    this.initHidden = d(doc.init_hidden); // (16, h)
    this.blocks = doc.blocks.map((b) => ({
      qkv: d(b.qkv), o: d(b.o), gateUp: d(b.gate_up),
      convW: d(b.dwconv_w), convB: d(b.dwconv_b), down: d(b.down),
    }));
    this.actionHead = { w: d(doc.action_head.w), b: d(doc.action_head.b) };
    this.valueHead = { w: d(doc.value_head.w), b: d(doc.value_head.b) };
  }

  static async load(url) {
    const resp = await fetch(url);
    if (!resp.ok) throw new Error(`fetch ${url}: ${resp.status}`);
    return new PureJsURM(await resp.json());
  }

  /** Non-causal MHA over the 16 cells (models/urm.py:_attention). */
  attention(blk, x) {
    const h = this.cfg.hidden_dim, nh = this.cfg.num_heads, hd = h / nh;
    const L = URM_CELLS;
    const qkv = urmMatmul(blk.qkv, x, L); // (L, 3h): [q | k | v] per cell
    const out = new Float32Array(L * h);
    const scale = 1 / Math.sqrt(hd);
    const scores = new Float32Array(L);
    for (let head = 0; head < nh; head++) {
      const off = head * hd;
      for (let q = 0; q < L; q++) {
        let mx = -Infinity;
        for (let k = 0; k < L; k++) {
          let s = 0;
          for (let i = 0; i < hd; i++) {
            s += qkv[q * 3 * h + off + i] * qkv[k * 3 * h + h + off + i];
          }
          scores[k] = s * scale;
          if (scores[k] > mx) mx = scores[k];
        }
        let z = 0;
        for (let k = 0; k < L; k++) {
          scores[k] = Math.exp(scores[k] - mx);
          z += scores[k];
        }
        for (let i = 0; i < hd; i++) {
          let acc = 0;
          for (let k = 0; k < L; k++) {
            acc += scores[k] * qkv[k * 3 * h + 2 * h + off + i];
          }
          out[q * h + off + i] = acc / z;
        }
      }
    }
    return urmMatmul(blk.o, out, L);
  }

  /** SwiGLU + depthwise conv over the cell sequence (models/urm.py:_conv_swiglu). */
  convSwiGLU(blk, x) {
    const L = URM_CELLS, inter = blk.down.shape[1], k = this.cfg.conv_kernel;
    const gu = urmMatmul(blk.gateUp, x, L); // (L, 2*inter)
    const hbuf = new Float32Array(L * inter);
    for (let l = 0; l < L; l++) {
      for (let i = 0; i < inter; i++) {
        hbuf[l * inter + i] = silu(gu[l * 2 * inter + i]) * gu[l * 2 * inter + inter + i];
      }
    }
    // conv[l] = sum_j pad(h)[l + j] * w[:, j], pad k//2 both sides, trim to L.
    const pad = Math.floor(k / 2);
    const conv = new Float32Array(L * inter);
    for (let l = 0; l < L; l++) {
      for (let i = 0; i < inter; i++) {
        let acc = blk.convB.data[i];
        for (let j = 0; j < k; j++) {
          const src = l + j - pad;
          if (src >= 0 && src < L) acc += hbuf[src * inter + i] * blk.convW.data[i * k + j];
        }
        conv[l * inter + i] = silu(acc);
      }
    }
    return urmMatmul(blk.down, conv, L);
  }

  /** Same contract as GameModel.predict: {logits: Float32Array(4), value}. */
  async predict(inputVec) {
    const h = this.cfg.hidden_dim, L = URM_CELLS, eps = this.cfg.rms_norm_eps;
    // Per-cell stem over (exp, r/3, c/3) triples, then LN + SiLU.
    const cells = new Float32Array(L * 3);
    for (let i = 0; i < 48; i++) cells[i] = inputVec[i];
    const stemOut = urmMatmul(this.stem.w, cells, L);
    const emb = new Float32Array(L * h);
    for (let l = 0; l < L; l++) {
      let mu = 0;
      for (let i = 0; i < h; i++) mu += stemOut[l * h + i];
      mu /= h;
      let varr = 0;
      for (let i = 0; i < h; i++) {
        const dlt = stemOut[l * h + i] - mu;
        varr += dlt * dlt;
      }
      const inv = 1 / Math.sqrt(varr / h + LN_EPS);
      for (let i = 0; i < h; i++) {
        emb[l * h + i] = silu(
          (stemOut[l * h + i] - mu) * inv * this.stem.g.data[i] + this.stem.b.data[i]
        );
      }
    }

    let hidden = Float32Array.from(this.initHidden.data); // (16, h)
    for (let loop = 0; loop < this.cfg.num_loops; loop++) {
      for (let i = 0; i < hidden.length; i++) hidden[i] += emb[i];
      for (const blk of this.blocks) {
        const att = this.attention(blk, hidden);
        for (let i = 0; i < hidden.length; i++) hidden[i] += att[i];
        urmRmsNorm(hidden, L, h, eps);
        const ff = this.convSwiGLU(blk, hidden);
        for (let i = 0; i < hidden.length; i++) hidden[i] += ff[i];
        urmRmsNorm(hidden, L, h, eps);
      }
    }

    const pooled = new Float32Array(h);
    for (let l = 0; l < L; l++) {
      for (let i = 0; i < h; i++) pooled[i] += hidden[l * h + i];
    }
    for (let i = 0; i < h; i++) pooled[i] /= L;
    return {
      logits: matvec(this.actionHead.w, pooled, this.actionHead.b),
      value: matvec(this.valueHead.w, pooled, this.valueHead.b)[0],
    };
  }

  async selectMove(game, { greedy = false } = {}) {
    const legal = game.legalDirections();
    if (!legal.length) return null;
    const { logits, value } = await this.predict(game.toModelFormat());
    const probs = GameModel.maskedProbs(logits, legal);
    const action = greedy ? GameModel.greedy(probs) : GameModel.sample(probs);
    return { action, probs, value };
  }
}

/** Load whichever pure-JS model the artifact declares. */
async function loadPureJsModel(url) {
  const resp = await fetch(url);
  if (!resp.ok) throw new Error(`fetch ${url}: ${resp.status}`);
  const doc = await resp.json();
  return doc.format === "tpu2048-urm-weights-v1"
    ? new PureJsURM(doc)
    : new PureJsModel(doc);
}
