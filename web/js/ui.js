/**
 * Demo UI controller: replay mode (step through best_game.json), live mode
 * (the ONNX model plays in-browser with probability bars), and human mode
 * (arrow keys / WASD — the graphical human-play client; the reference's is a
 * pgzero desktop window, play.py:1-138). In human mode the model, when
 * loaded, shows what it would have played as a hint.
 */
"use strict";

const SPEEDS = [
  { label: "0.25×", ms: 1200 }, { label: "0.5×", ms: 600 },
  { label: "1×", ms: 300 }, { label: "2×", ms: 150 },
  { label: "4×", ms: 75 }, { label: "8×", ms: 40 },
  { label: "16×", ms: 20 }, { label: "32×", ms: 10 },
  { label: "64×", ms: 5 }, { label: "max", ms: 0 },
];

class UIController {
  constructor() {
    this.mode = "replay";
    this.replay = null;
    this.replayIdx = 0;
    this.model = null;
    this.game = null;
    this.playing = false;
    this.timer = null;
    this.speedIdx = 2;
    this.searchMode = false;
    // Pure normalized-EV fallback; model_config.json's search_coefs
    // (points/mono/empt/sigma/mu/gamma — see train/export.py) override it.
    this.searchCoefs = {};
    this.bind();
    this.loadAssets();
  }

  $(id) { return document.getElementById(id); }

  bind() {
    this.$("btn-mode-replay").onclick = () => this.setMode("replay");
    this.$("btn-mode-live").onclick = () => this.setMode("live");
    this.$("btn-mode-human").onclick = () => this.setMode("human");
    document.addEventListener("keydown", (e) => this.onKey(e));
    this.$("btn-play").onclick = () => this.setPlaying(!this.playing);
    this.$("btn-step").onclick = () => this.stepOnce();
    this.$("btn-restart").onclick = () => this.restart();
    const sp = this.$("speed");
    SPEEDS.forEach((s, i) => {
      const o = document.createElement("option");
      o.value = i; o.textContent = s.label;
      if (i === this.speedIdx) o.selected = true;
      sp.appendChild(o);
    });
    sp.onchange = (e) => {
      this.speedIdx = +e.target.value;
      if (this.playing) this.setPlaying(true);
    };
    this.$("slider").oninput = (e) => {
      this.replayIdx = +e.target.value;
      this.renderReplay();
    };
    const st = this.$("search-toggle");
    if (st) st.onchange = (e) => { this.searchMode = e.target.checked; };
  }

  async loadAssets() {
    try {
      const res = await fetch("data/best_game.json");
      this.replay = await res.json();
      this.$("replay-score").textContent = this.replay.score;
    } catch (e) {
      this.setStatus("no best_game.json found — run export-demo");
    }
    try {
      if (typeof ort === "undefined") {
        // CDN unreachable (offline/air-gapped): dependency-free JS forward
        // over the raw-weights artifact instead of ONNX Runtime Web.
        this.model = await loadPureJsModel("data/model_weights.json");
        this.setStatus("offline mode: pure-JS inference (no ONNX Runtime)");
      } else {
        this.model = await GameModel.load("data/model.onnx");
      }
      this.$("btn-mode-live").disabled = false;
    } catch (e) {
      this.setStatus("model unavailable — live mode disabled");
    }
    try {
      const cfg = await (await fetch("data/model_config.json")).json();
      if (cfg.search_coefs) this.searchCoefs = cfg.search_coefs;
    } catch (e) { /* keep pure-EV fallback */ }
    this.setMode("replay");
  }

  setStatus(msg) { this.$("status").textContent = msg; }

  setMode(mode) {
    this.setPlaying(false);
    this.mode = mode;
    this.$("btn-mode-replay").classList.toggle("active", mode === "replay");
    this.$("btn-mode-live").classList.toggle("active", mode === "live");
    this.$("btn-mode-human").classList.toggle("active", mode === "human");
    this.$("slider-wrap").style.display = mode === "replay" ? "" : "none";
    this.$("probs").style.display = mode === "replay" ? "none" : "";
    if (mode === "replay") {
      this.replayIdx = 0;
      this.renderReplay();
    } else {
      this.restart();
    }
    if (mode === "human") {
      this.setStatus("Your move — arrow keys or WASD");
    }
  }

  restart() {
    this.setPlaying(false);
    if (this.mode === "live" || this.mode === "human") {
      this.game = new Game2048();
      this.game.reset();
      this.renderLive(null);
      if (this.mode === "human") this.showHint();
    } else {
      this.replayIdx = 0;
      this.renderReplay();
    }
  }

  async onKey(e) {
    if (this.mode !== "human" || !this.game) return;
    const keys = {
      ArrowUp: 0, w: 0, W: 0, ArrowDown: 1, s: 1, S: 1,
      ArrowLeft: 2, a: 2, A: 2, ArrowRight: 3, d: 3, D: 3,
    };
    const action = keys[e.key];
    if (action === undefined) return;
    e.preventDefault();
    if (!this.game.hasNextStep()) return;
    const gained = this.game.move(action); // -1 = board unchanged (illegal)
    const names = ["UP", "DOWN", "LEFT", "RIGHT"];
    this.renderLive(null);
    if (gained < 0) {
      this.setStatus(`${names[action]} is not a legal move`);
      return;
    }
    if (!this.game.hasNextStep()) return; // renderLive printed game over
    this.setStatus(`You played ${names[action]}`);
    this.showHint();
  }

  async showHint() {
    // Model's opinion of the CURRENT position (post-move), as a teaching aid.
    if (!this.model || !this.game.hasNextStep()) return;
    const pick = this.searchMode
      ? await expectimaxMove(this.model, this.game, this.searchCoefs)
      : await this.model.selectMove(this.game, { greedy: true });
    if (pick) this.renderProbs(pick.probs);
  }

  setPlaying(on) {
    this.playing = on;
    this.$("btn-play").textContent = on ? "⏸ Pause" : "▶ Play";
    clearTimeout(this.timer);
    if (on) this.tick();
  }

  async tick() {
    if (!this.playing) return;
    const more = await this.stepOnce();
    if (!more) { this.setPlaying(false); return; }
    this.timer = setTimeout(() => this.tick(), SPEEDS[this.speedIdx].ms);
  }

  async stepOnce() {
    if (this.mode === "replay") {
      if (!this.replay || this.replayIdx >= this.replay.moves.length - 1) return false;
      this.replayIdx++;
      this.renderReplay();
      return true;
    }
    if (!this.model || !this.game || !this.game.hasNextStep()) return false;
    const pick = this.searchMode
      ? await expectimaxMove(this.model, this.game, this.searchCoefs)
      : await this.model.selectMove(this.game);
    if (!pick) return false;
    this.game.move(pick.action);
    this.renderLive(pick);
    return this.game.hasNextStep();
  }

  renderBoard(values) {
    const el = this.$("board");
    el.innerHTML = "";
    values.flat().forEach((v) => {
      const d = document.createElement("div");
      d.className = "tile t" + Math.min(v, 2048);
      d.textContent = v || "";
      if (v >= 1024) d.style.fontSize = "18px";
      el.appendChild(d);
    });
  }

  renderReplay() {
    if (!this.replay) return;
    const moves = this.replay.moves;
    const slider = this.$("slider");
    slider.max = Math.max(moves.length - 1, 0);
    slider.value = this.replayIdx;
    const m = moves[this.replayIdx];
    if (!m) return;
    this.renderBoard(m.state_after);
    let cum = 0;
    for (let i = 0; i <= this.replayIdx; i++) cum += moves[i].points_earned || 0;
    this.$("score").textContent = cum;
    this.setStatus(`Replay move ${m.step}/${moves.length}: ${m.action} (+${m.points_earned})`);
  }

  renderLive(pick) {
    const values = this.game.grid.map((row) => row.map((v) => (v ? 1 << v : 0)));
    this.renderBoard(values);
    this.$("score").textContent = this.game.score();
    if (pick) {
      const names = ["UP", "DOWN", "LEFT", "RIGHT"];
      this.setStatus(`Model played ${names[pick.action]} (V=${pick.value.toFixed(2)})`);
      this.renderProbs(pick.probs);
    }
    if (!this.game.hasNextStep()) {
      this.setStatus(`Game over — score ${this.game.score()}, best tile ${this.game.getMaxTile()}`);
    }
  }

  renderProbs(probs) {
    const names = ["UP", "DOWN", "LEFT", "RIGHT"];
    const bars = this.$("probs");
    bars.innerHTML = this.mode === "human" ? "<h2>Model hint</h2>" : "";
    probs.forEach((p, d) => {
      const row = document.createElement("div");
      row.className = "prob-row";
      row.innerHTML =
        `<span>${names[d]}</span>` +
        `<div class="bar-wrap"><div class="bar" style="width:${(p * 100).toFixed(1)}%"></div></div>` +
        `<b>${(p * 100).toFixed(1)}%</b>`;
      bars.appendChild(row);
    });
  }
}

document.addEventListener("DOMContentLoaded", () => new UIController());
