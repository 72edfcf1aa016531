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

/**
 * Exact 1-ply expectimax with critic leaves (JS mirror of
 * tpu2048/algo/search.py): score every legal move by
 *   pointsCoef * merge_points + valueCoef * E_spawn[ V(child) ]
 * over all 32 spawn children (16 cells x {2: p=.9, 4: p=.1}). Works with
 * either inference backend (GameModel / PureJsModel — both expose predict).
 * Returns {action, probs (display shares over legal moves), value} or null.
 */
async function expectimaxMove(model, game, { points = 0, value = 1 } = {}) {
  const legal = game.legalDirections();
  if (!legal.length) return null;
  const scores = [NaN, NaN, NaN, NaN];
  for (const d of legal) {
    const [merged, pts] = Game2048.simulate(game.grid, d);
    const empties = [];
    for (let r = 0; r < 4; r++)
      for (let c = 0; c < 4; c++) if (!merged[r][c]) empties.push([r, c]);
    let ev = 0;
    for (const [r, c] of empties) {
      for (const [exp, pr] of [[1, 0.9], [2, 0.1]]) {
        merged[r][c] = exp;
        const out = await model.predict(Game2048.modelFormatOf(merged));
        ev += (pr / empties.length) * out.value;
        merged[r][c] = 0;
      }
    }
    scores[d] = points * pts + value * ev;
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
