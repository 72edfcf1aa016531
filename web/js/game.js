/**
 * 2048 game engine — browser port of the framework's environment semantics
 * (tpu2048/env/engine.py; behavior per the reference game.py:45-1030).
 * Grids hold EXPONENTS (0 = empty, k -> tile 2^k), row-major [row][col].
 * Direction indices: 0=UP 1=DOWN 2=LEFT 3=RIGHT.
 */
"use strict";

const GRID_SIZE = 4;
const DIRECTIONS = ["UP", "DOWN", "LEFT", "RIGHT"];

class Game2048 {
  constructor(grid = null) {
    this.grid = grid
      ? grid.map((r) => r.slice())
      : Array.from({ length: GRID_SIZE }, () => new Array(GRID_SIZE).fill(0));
  }

  clone() {
    return new Game2048(this.grid);
  }

  reset() {
    this.grid = Array.from({ length: GRID_SIZE }, () => new Array(GRID_SIZE).fill(0));
    this.addRandomTile();
    this.addRandomTile();
    return this.grid;
  }

  /** 90% exponent 1 (tile 2), 10% exponent 2 (tile 4), uniform empty cell. */
  addRandomTile() {
    const empties = [];
    for (let r = 0; r < GRID_SIZE; r++)
      for (let c = 0; c < GRID_SIZE; c++)
        if (this.grid[r][c] === 0) empties.push([r, c]);
    if (!empties.length) return false;
    const [r, c] = empties[Math.floor(Math.random() * empties.length)];
    this.grid[r][c] = Math.random() < 0.9 ? 1 : 2;
    return true;
  }

  /** Slide+merge one row leftward: left-priority, single merge per tile,
   *  score = value of each created tile. */
  static mergeRowLeft(row) {
    const vals = row.filter((v) => v !== 0);
    const out = [];
    let score = 0;
    for (let i = 0; i < vals.length; i++) {
      if (i + 1 < vals.length && vals[i] === vals[i + 1]) {
        const exp = vals[i] + 1;
        out.push(exp);
        score += 1 << exp;
        i++;
      } else {
        out.push(vals[i]);
      }
    }
    while (out.length < GRID_SIZE) out.push(0);
    return [out, score];
  }

  /** Simulate a move without mutating; returns [newGrid, score, changed]. */
  static simulate(grid, dir) {
    const get =
      dir === 2 ? (i, j) => grid[i][j]           // LEFT: rows
      : dir === 3 ? (i, j) => grid[i][3 - j]     // RIGHT: reversed rows
      : dir === 0 ? (i, j) => grid[j][i]         // UP: columns
      : (i, j) => grid[3 - j][i];                // DOWN: reversed columns
    const set = (out, i, j, v) => {
      if (dir === 2) out[i][j] = v;
      else if (dir === 3) out[i][3 - j] = v;
      else if (dir === 0) out[j][i] = v;
      else out[3 - j][i] = v;
    };
    const out = Array.from({ length: GRID_SIZE }, () => new Array(GRID_SIZE).fill(0));
    let score = 0;
    for (let i = 0; i < GRID_SIZE; i++) {
      const line = [];
      for (let j = 0; j < GRID_SIZE; j++) line.push(get(i, j));
      const [merged, s] = Game2048.mergeRowLeft(line);
      score += s;
      for (let j = 0; j < GRID_SIZE; j++) set(out, i, j, merged[j]);
    }
    let changed = false;
    for (let r = 0; r < GRID_SIZE; r++)
      for (let c = 0; c < GRID_SIZE; c++)
        if (out[r][c] !== grid[r][c]) changed = true;
    return [out, score, changed];
  }

  canMove(dir) {
    return Game2048.simulate(this.grid, dir)[2];
  }

  legalDirections() {
    return [0, 1, 2, 3].filter((d) => this.canMove(d));
  }

  hasNextStep() {
    return this.legalDirections().length > 0;
  }

  /** Apply a move + spawn. Returns points earned, or -1 if illegal. */
  move(dir) {
    const [out, score, changed] = Game2048.simulate(this.grid, dir);
    if (!changed) return -1;
    this.grid = out;
    this.addRandomTile();
    return score;
  }

  score() {
    let s = 0;
    for (const row of this.grid) for (const v of row) if (v > 0) s += 1 << v;
    return s;
  }

  getMaxTile() {
    let m = 0;
    for (const row of this.grid) for (const v of row) m = Math.max(m, v);
    return m > 0 ? 1 << m : 0;
  }

  /** 48-dim model input: per cell (exponent, row/3, col/3), row-major —
   *  the encoding from tpu2048/models/encoding.py. */
  toModelFormat() {
    return Game2048.modelFormatOf(this.grid);
  }

  /** 48-dim interleaved (exponent, r/3, c/3) encoding of any grid. */
  static modelFormatOf(grid) {
    const out = new Float32Array(48);
    let k = 0;
    for (let r = 0; r < GRID_SIZE; r++)
      for (let c = 0; c < GRID_SIZE; c++) {
        out[k++] = grid[r][c];
        out[k++] = r / 3;
        out[k++] = c / 3;
      }
    return out;
  }
}
