// Headless smoke test for the no-build SPA (frontend/build/assets/*).
// Renders every page against the RUNNING gateway API (default
// http://localhost:8123) under a minimal DOM shim and asserts each page
// mounts without throwing and produces its landmark text.  Run:
//   node tools/spa_smoke.mjs [baseUrl]

const BASE = process.argv[2] || "http://localhost:8123";

// -- minimal DOM shim ---------------------------------------------------------
class Node_ {
  constructor() {
    this.childNodes = [];
    this.parentNode = null;
  }
  append(...kids) {
    for (const k of kids.flat(Infinity)) {
      if (k === null || k === undefined || k === false) continue;
      const node = k instanceof Node_ ? k : new Text_(String(k));
      node.parentNode = this;
      this.childNodes.push(node);
    }
  }
  appendChild(k) {
    this.append(k);
    return k;
  }
  replaceChildren(...kids) {
    this.childNodes = [];
    this.append(...kids);
  }
  replaceWith(...kids) {
    if (!this.parentNode) return;
    const sibs = this.parentNode.childNodes;
    const i = sibs.indexOf(this);
    const repl = kids.flat(Infinity).map((k) => {
      const node = k instanceof Node_ ? k : new Text_(String(k));
      node.parentNode = this.parentNode;
      return node;
    });
    sibs.splice(i, 1, ...repl);
  }
  remove() {
    if (!this.parentNode) return;
    const sibs = this.parentNode.childNodes;
    const i = sibs.indexOf(this);
    if (i >= 0) sibs.splice(i, 1);
  }
  get lastChild() {
    return this.childNodes[this.childNodes.length - 1] || null;
  }
  get textContent() {
    return this.childNodes.map((c) => c.textContent).join("");
  }
  set textContent(v) {
    this.childNodes = v === "" ? [] : [new Text_(String(v))];
  }
  closest() {
    return null;
  }
  addEventListener() {}
}
class Text_ extends Node_ {
  constructor(data) {
    super();
    this.data = data;
  }
  get textContent() {
    return this.data;
  }
}
class Element_ extends Node_ {
  constructor(tag) {
    super();
    this.tagName = tag.toUpperCase();
    this.attributes = {};
    this.style = { get display() { return this._d || ""; }, set display(v) { this._d = v; } };
    this.value = "";
    this.disabled = false;
    this.checked = false;
    this.files = [];
  }
  setAttribute(k, v) {
    this.attributes[k] = v;
    if (k === "class") this.className = v;
  }
  getAttribute(k) {
    return this.attributes[k];
  }
  set innerHTML(html) {
    this._innerHTML = html;
    this.childNodes = [new Text_(html.replace(/<[^>]*>/g, " "))];
  }
  get innerHTML() {
    return this._innerHTML || "";
  }
  set className(v) {
    this.attributes.class = v;
    this._cls = v;
  }
  get className() {
    return this._cls || "";
  }
  dispatchEvent() {}
  click() {}
}

const elementsById = {};
globalThis.document = {
  createElement: (t) => new Element_(t),
  createTextNode: (t) => new Text_(t),
  getElementById: (id) => (elementsById[id] ||= new Element_("div")),
  addEventListener: () => {},
  body: new Element_("body"),
};
globalThis.window = { addEventListener: () => {}, confirm: () => false };
globalThis.localStorage = { getItem: () => null, setItem: () => {} };
globalThis.history = { pushState: () => {}, state: null };
globalThis.location = { pathname: "/" };
globalThis.Node = Node_;
globalThis.Event = class {};
globalThis.FileReader = class {
  readAsText() {}
};
globalThis.prompt = () => null;
const realFetch = globalThis.fetch;
globalThis.fetch = (url, opts) =>
  realFetch(url.startsWith("http") ? url : BASE + url, opts);

// -- import and exercise ------------------------------------------------------
import path from "node:path";
import { pathToFileURL } from "node:url";
const root = path.resolve(path.dirname(new URL(import.meta.url).pathname), "..");
const P = (p) => pathToFileURL(path.join(root, "frontend/build", p)).href;

// ui.js / api.js import via absolute '/assets/...' specifiers inside page
// modules - register a loader hook (thread variant; Node 20-compatible)
// to map them onto the build dir.
const { register } = await import("node:module");
const loaderSrc = `
export function resolve(specifier, context, nextResolve) {
  if (specifier.startsWith("/assets/")) {
    return { url: ${JSON.stringify(pathToFileURL(path.join(root, "frontend/build")).href)} + specifier, shortCircuit: true };
  }
  return nextResolve(specifier, context);
}`;
register(`data:text/javascript,${encodeURIComponent(loaderSrc)}`);

const ui = await import(P("assets/ui.js"));
ui.initRouter(() => {});

const PAGES = [
  ["Dashboard", "Dashboard.js", {}, "Total Webhooks"],
  ["WebhookList", "WebhookList.js", {}, "Webhooks"],
  ["WebhookForm(new)", "WebhookForm.js", {}, "Transform Query"],
  ["ReferenceTableList", "ReferenceTableList.js", {}, "Reference Tables"],
  ["ReferenceTableUpload", "ReferenceTableUpload.js", {}, "Upload CSV File"],
  ["UdfList", "UdfList.js", {}, "User-Defined Functions"],
  ["UdfForm", "UdfForm.js", {}, "Python Function Code"],
  ["WebhookTester", "WebhookTester.js", {}, "Test Your Webhooks"],
  ["SqlQuery", "SqlQuery.js", {}, "Run SQL Queries"],
  ["NotFound", "NotFound.js", {}, "Page Not Found"],
];

let failures = 0;
for (const [label, file, params, landmark] of PAGES) {
  const mod = await import(P(`assets/pages/${file}`));
  const pageFn = Object.values(mod)[0];
  const mount = new Element_("main");
  try {
    await pageFn(mount, params);
    const text = mount.textContent;
    if (!text.includes(landmark)) {
      console.log(`FAIL ${label}: landmark '${landmark}' missing; got: ${text.slice(0, 160)}`);
      failures++;
    } else {
      console.log(`ok   ${label}`);
    }
  } catch (e) {
    console.log(`FAIL ${label}: threw ${e.stack?.split("\n")[0]}`);
    failures++;
  }
}

// WebhookDetail needs a real webhook id
const res = await fetch("/webhooks", { headers: { "X-API-Key": "default_key" } });
const hooks = (await res.json()).webhooks || [];
if (hooks.length) {
  const mod = await import(P("assets/pages/WebhookDetail.js"));
  const mount = new Element_("main");
  try {
    await mod.WebhookDetail(mount, { id: hooks[0].id });
    const ok = mount.textContent.includes("Transform Query");
    console.log(ok ? "ok   WebhookDetail" : `FAIL WebhookDetail: ${mount.textContent.slice(0, 160)}`);
    if (!ok) failures++;
  } catch (e) {
    console.log(`FAIL WebhookDetail: threw ${e.stack?.split("\n")[0]}`);
    failures++;
  }
} else {
  console.log("skip WebhookDetail (no webhooks registered)");
}

console.log(failures ? `${failures} FAILURES` : "ALL PAGES OK");
process.exit(failures ? 1 : 0);
