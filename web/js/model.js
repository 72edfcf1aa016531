/**
 * ONNX Runtime Web inference wrapper for the exported GameMLP
 * (artifact written by tpu2048/utils/onnx_writer.py: input "board_state"
 * (1,48), outputs "action_logits" (1,4) and "value" (1,1)).
 */
"use strict";

class GameModel {
  constructor(session) {
    this.session = session;
  }

  static async load(url) {
    const session = await ort.InferenceSession.create(url, {
      executionProviders: ["wasm"],
    });
    return new GameModel(session);
  }

  /** Returns {logits: Float32Array(4), value: number}. */
  async predict(inputVec) {
    const tensor = new ort.Tensor("float32", inputVec, [1, 48]);
    const out = await this.session.run({ board_state: tensor });
    return {
      logits: out.action_logits.data,
      value: out.value.data[0],
    };
  }

  /** Masked softmax over legal directions (numerically stable). */
  static maskedProbs(logits, legalDirs) {
    const masked = [0, 1, 2, 3].map((d) =>
      legalDirs.includes(d) ? logits[d] : -Infinity
    );
    const mx = Math.max(...masked);
    const exps = masked.map((x) => Math.exp(x - mx));
    const z = exps.reduce((a, b) => a + b, 0);
    return exps.map((e) => e / z);
  }

  static sample(probs) {
    let u = Math.random();
    for (let d = 0; d < probs.length; d++) {
      u -= probs[d];
      if (u <= 0) return d;
    }
    return probs.indexOf(Math.max(...probs));
  }

  static greedy(probs) {
    return probs.indexOf(Math.max(...probs));
  }

  /** Pick a move for the given game. Returns {action, probs, value}. */
  async selectMove(game, { greedy = false } = {}) {
    const legal = game.legalDirections();
    if (!legal.length) return null;
    const { logits, value } = await this.predict(game.toModelFormat());
    const probs = GameModel.maskedProbs(logits, legal);
    const action = greedy ? GameModel.greedy(probs) : GameModel.sample(probs);
    return { action, probs, value };
  }
}

/** Ordered adjacent pairs (left>=right, top>=bottom, both nonzero) — JS
 *  mirror of tpu2048/env/heuristics.py::_pair_count. */
function pairCount(g) {
  let n = 0;
  for (let r = 0; r < 4; r++)
    for (let c = 0; c < 3; c++)
      if (g[r][c] > 0 && g[r][c + 1] > 0 && g[r][c] >= g[r][c + 1]) n++;
  for (let r = 0; r < 3; r++)
    for (let c = 0; c < 4; c++)
      if (g[r][c] > 0 && g[r + 1][c] > 0 && g[r][c] >= g[r + 1][c]) n++;
  return n;
}

function rotateCW(g) {
  const o = [...Array(4)].map(() => Array(4).fill(0));
  for (let r = 0; r < 4; r++) for (let c = 0; c < 4; c++) o[c][3 - r] = g[r][c];
  return o;
}

/** Monotonicity heuristic — mirror of heuristics.py::monotonicity (best
 *  pair count over 4 rotations; x2 if the FIRST max tile in row-major scan
 *  is in a corner, else floor(/2)). */
function monotonicity(g) {
  let best = pairCount(g);
  let b = g;
  for (let i = 0; i < 3; i++) {
    b = rotateCW(b);
    best = Math.max(best, pairCount(b));
  }
  let maxv = -1, idx = 0;
  for (let r = 0; r < 4; r++)
    for (let c = 0; c < 4; c++)
      if (g[r][c] > maxv) { maxv = g[r][c]; idx = r * 4 + c; }
  const corner = idx === 0 || idx === 3 || idx === 12 || idx === 15;
  return corner ? best * 2 : Math.floor(best / 2);
}

function emptiness(g) {
  let n = 0;
  for (const row of g) for (const v of row) if (!v) n++;
  return n;
}

function anyLegalOf(grid) {
  return [0, 1, 2, 3].some((d) => Game2048.simulate(grid, d)[2]);
}

/**
 * Exact 1-ply expectimax with critic leaves (JS mirror of
 * tpu2048/algo/search.py — the shaped Bellman backup of the trained
 * objective): score every legal move by
 *   points*pts + gamma * E_spawn[ alive(child) * (phi(merged) + sigma*V(child) + mu) ]
 * with phi = mono*monotonicity + empt*emptiness over all 32 spawn children
 * (16 cells x {2: p=.9, 4: p=.1}); dead children contribute 0 (the critic
 * never trains on terminal boards). Coefs come from model_config.json's
 * search_coefs (written by train/export.py). Works with either inference
 * backend (GameModel / PureJsModel — both expose predict).
 * Returns {action, probs (display shares over legal moves), value} or null.
 */
async function expectimaxMove(model, game, coefs = {}) {
  const { points = 0, mono = 0, empt = 0, sigma = 1, mu = 0,
          gamma = 0.99 } = coefs;
  const legal = game.legalDirections();
  if (!legal.length) return null;
  const scores = [NaN, NaN, NaN, NaN];
  for (const d of legal) {
    const [merged, pts] = Game2048.simulate(game.grid, d);
    const phiM = mono * monotonicity(merged) + empt * emptiness(merged);
    const empties = [];
    for (let r = 0; r < 4; r++)
      for (let c = 0; c < 4; c++) if (!merged[r][c]) empties.push([r, c]);
    let ev = 0;
    for (const [r, c] of empties) {
      for (const [exp, pr] of [[1, 0.9], [2, 0.1]]) {
        merged[r][c] = exp;
        let contrib = 0;
        if (anyLegalOf(merged)) {
          const out = await model.predict(Game2048.modelFormatOf(merged));
          contrib = phiM + sigma * out.value + mu;
        }
        ev += (pr / empties.length) * contrib;
        merged[r][c] = 0;
      }
    }
    scores[d] = points * pts + gamma * ev;
  }
  let action = legal[0];
  for (const d of legal) if (scores[d] > scores[action]) action = d;
  // Display shares: min-shifted scores over legal moves (not a policy).
  const finite = legal.map((d) => scores[d]);
  const lo = Math.min(...finite);
  const shifted = legal.map((d) => scores[d] - lo);
  const z = shifted.reduce((a, b) => a + b, 0) || 1;
  const probs = [0, 0, 0, 0];
  legal.forEach((d, i) => { probs[d] = shifted[i] / z; });
  return { action, probs, value: scores[action] };
}
