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
