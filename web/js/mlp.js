/**
 * Dependency-free GameMLP forward pass in plain JS, for offline/air-gapped
 * use when ONNX Runtime Web (CDN) is unavailable. Consumes the
 * model_weights.json artifact written by tpu2048/train/export.py
 * (exact float32 weights, base64). Architecture mirrors
 * tpu2048/models/mlp.py:apply (reference game.py:1049-1220):
 *   stem Linear(48->h, no bias) + LayerNorm + ReLU;
 *   num_layers x [x + ReLU(LN(Linear(x, no bias)))]   (dropout off at eval);
 *   biased action head (h->4) and value head (h->1).
 */
"use strict";

const LN_EPS = 1e-5; // torch LayerNorm default (models/layers.py:9)

function decodeTensor(t) {
  const bin = atob(t.data);
  const bytes = new Uint8Array(bin.length);
  for (let i = 0; i < bin.length; i++) bytes[i] = bin.charCodeAt(i);
  return { shape: t.shape, data: new Float32Array(bytes.buffer) };
}

/** y = W x (+ b). W stored row-major (out, in). */
function matvec(W, x, b) {
  const [out, inn] = W.shape;
  const y = new Float32Array(out);
  const w = W.data;
  for (let o = 0; o < out; o++) {
    let acc = b ? b.data[o] : 0;
    const row = o * inn;
    for (let i = 0; i < inn; i++) acc += w[row + i] * x[i];
    y[o] = acc;
  }
  return y;
}

function layerNormRelu(g, b, x) {
  const n = x.length;
  let mu = 0;
  for (let i = 0; i < n; i++) mu += x[i];
  mu /= n;
  let varr = 0;
  for (let i = 0; i < n; i++) varr += (x[i] - mu) * (x[i] - mu);
  varr /= n;
  const inv = 1 / Math.sqrt(varr + LN_EPS);
  const y = new Float32Array(n);
  for (let i = 0; i < n; i++) {
    const v = (x[i] - mu) * inv * g.data[i] + b.data[i];
    y[i] = v > 0 ? v : 0; // fused ReLU (both call sites apply it)
  }
  return y;
}

class PureJsModel {
  constructor(doc) {
    if (doc.format !== "tpu2048-mlp-weights-v1") {
      throw new Error(`unsupported weights format: ${doc.format}`);
    }
    this.stem = {
      w: decodeTensor(doc.stem.w),
      g: decodeTensor(doc.stem.ln_g),
      b: decodeTensor(doc.stem.ln_b),
    };
    this.blocks = doc.blocks.map((blk) => ({
      w: decodeTensor(blk.w),
      g: decodeTensor(blk.ln_g),
      b: decodeTensor(blk.ln_b),
    }));
    this.actionHead = {
      w: decodeTensor(doc.action_head.w),
      b: decodeTensor(doc.action_head.b),
    };
    this.valueHead = {
      w: decodeTensor(doc.value_head.w),
      b: decodeTensor(doc.value_head.b),
    };
  }

  static async load(url) {
    const resp = await fetch(url);
    if (!resp.ok) throw new Error(`fetch ${url}: ${resp.status}`);
    return new PureJsModel(await resp.json());
  }

  /** Same contract as GameModel.predict: {logits: Float32Array(4), value}. */
  async predict(inputVec) {
    let x = layerNormRelu(this.stem.g, this.stem.b, matvec(this.stem.w, inputVec));
    for (const blk of this.blocks) {
      const h = layerNormRelu(blk.g, blk.b, matvec(blk.w, x));
      const y = new Float32Array(x.length);
      for (let i = 0; i < x.length; i++) y[i] = x[i] + h[i];
      x = y;
    }
    return {
      logits: matvec(this.actionHead.w, x, this.actionHead.b),
      value: matvec(this.valueHead.w, x, this.valueHead.b)[0],
    };
  }

  /** Same contract as GameModel.selectMove (delegates to its statics). */
  async selectMove(game, { greedy = false } = {}) {
    const legal = game.legalDirections();
    if (!legal.length) return null;
    const { logits, value } = await this.predict(game.toModelFormat());
    const probs = GameModel.maskedProbs(logits, legal);
    const action = greedy ? GameModel.greedy(probs) : GameModel.sample(probs);
    return { action, probs, value };
  }
}
