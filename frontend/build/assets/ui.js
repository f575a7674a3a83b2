// Shared UI toolkit - plain-DOM equivalents of the reference's
// components/ (Layout, PageHeader, DataTable, CodeEditor) plus the
// notistack snackbar and MUI Dialog patterns its pages rely on.

export function h(tag, attrs = {}, ...children) {
  const el = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs || {})) {
    if (v === null || v === undefined || v === false) continue;
    if (k === "class") el.className = v;
    else if (k === "style") el.setAttribute("style", v);
    else if (k.startsWith("on")) el.addEventListener(k.slice(2), v);
    else if (k === "value" && "value" in el) el.value = v;
    else if (k === "checked" || k === "disabled" || k === "readonly" || k === "selected") {
      if (v) el.setAttribute(k === "readonly" ? "readonly" : k, "");
      if (k === "disabled") el.disabled = !!v;
      if (k === "checked") el.checked = !!v;
    } else el.setAttribute(k, String(v));
  }
  for (const c of children.flat(Infinity)) {
    if (c === null || c === undefined || c === false) continue;
    el.append(c instanceof Node ? c : document.createTextNode(String(c)));
  }
  return el;
}

// -- snackbar (notistack equivalent) ---------------------------------------
export function snackbar(message, variant = "default") {
  const host = document.getElementById("snackbar");
  const snack = h("div", { class: `snack ${variant}` }, message);
  host.append(snack);
  setTimeout(() => snack.remove(), 4000);
}

// -- PageHeader -------------------------------------------------------------
export function pageHeader({
  title,
  buttonText,
  buttonPath,
  buttonAction,
  secondaryButtonText,
  secondaryButtonPath,
}) {
  const right = [];
  if (secondaryButtonText) {
    right.push(
      h(
        "button",
        { class: "btn-outlined", onclick: () => navigate(secondaryButtonPath) },
        secondaryButtonText,
      ),
    );
  }
  if (buttonText) {
    right.push(
      h(
        "button",
        {
          class: "btn-contained",
          onclick: buttonAction || (() => navigate(buttonPath)),
        },
        buttonText,
      ),
    );
  }
  return h(
    "div",
    { class: "page-header" },
    h("h1", {}, title),
    h("div", { class: "right" }, ...right),
  );
}

// -- DataTable (sticky header + pagination, like components/DataTable.tsx) --
export function dataTable({ columns, rows, loading = false, error = null }) {
  if (loading) return h("div", { class: "spinner" });
  if (error) {
    return h(
      "div",
      { class: "paper", style: "background:#ffebee" },
      h("span", { style: "color:var(--error)" }, `Error: ${error.message || error}`),
    );
  }
  if (!rows.length) {
    return h("div", { class: "paper center" }, "No data available");
  }
  const state = { page: 0, rowsPerPage: 10 };
  const wrap = h("div", { class: "paper", style: "padding:0;overflow:hidden" });
  const render = () => {
    wrap.replaceChildren();
    const start = state.page * state.rowsPerPage;
    const pageRows = rows.slice(start, start + state.rowsPerPage);
    const thead = h(
      "tr",
      {},
      ...columns.map((c) =>
        h("th", { style: c.align === "right" ? "text-align:right" : "" }, c.label),
      ),
    );
    const body = pageRows.map((row) =>
      h(
        "tr",
        {},
        ...columns.map((c) => {
          const v = row[c.id];
          const content = c.format ? c.format(v, row) : v;
          return h(
            "td",
            { style: c.align === "right" ? "text-align:right" : "" },
            content === null || content === undefined ? "" : content,
          );
        }),
      ),
    );
    const nPages = Math.max(1, Math.ceil(rows.length / state.rowsPerPage));
    const pager = h(
      "div",
      { class: "tbl-pager" },
      h(
        "span",
        {},
        "Rows per page: ",
        h(
          "select",
          {
            style: "width:auto;padding:3px 6px",
            onchange: (e) => {
              state.rowsPerPage = +e.target.value;
              state.page = 0;
              render();
            },
          },
          ...[10, 25, 100].map((n) =>
            h("option", { value: n, selected: n === state.rowsPerPage }, n),
          ),
        ),
      ),
      h(
        "span",
        {},
        `${start + 1}-${Math.min(start + state.rowsPerPage, rows.length)} of ${rows.length}`,
      ),
      h(
        "button",
        {
          disabled: state.page === 0,
          onclick: () => {
            state.page -= 1;
            render();
          },
        },
        "‹",
      ),
      h(
        "button",
        {
          disabled: state.page >= nPages - 1,
          onclick: () => {
            state.page += 1;
            render();
          },
        },
        "›",
      ),
    );
    wrap.append(
      h(
        "div",
        { style: "max-height:440px;overflow:auto" },
        h("table", { class: "data" }, h("thead", {}, thead), h("tbody", {}, ...body)),
      ),
      pager,
    );
  };
  render();
  return wrap;
}

// -- CodeEditor (textarea stand-in for the Monaco editor) -------------------
export function codeEditor({ value = "", onChange, height = "300px", readOnly = false, language = "sql" }) {
  const ta = h("textarea", {
    class: "code",
    spellcheck: "false",
    "data-language": language,
    readonly: readOnly,
    style: `height:${height}`,
  });
  ta.value = value;
  if (onChange) ta.addEventListener("input", () => onChange(ta.value));
  return ta;
}

// -- Dialog ------------------------------------------------------------------
export function dialog({ title, content, actions }) {
  const backdrop = h("div", { class: "modal-backdrop" });
  const close = () => backdrop.remove();
  const modal = h(
    "div",
    { class: "modal" },
    h("h2", {}, title),
    content,
    h("div", { class: "right", style: "margin-top:16px" }, ...actions(close)),
  );
  backdrop.addEventListener("click", (e) => {
    if (e.target === backdrop) close();
  });
  backdrop.append(modal);
  document.body.append(backdrop);
  return close;
}

export function confirmDialog(text, onConfirm) {
  dialog({
    title: "Confirm Deletion",
    content: h("p", { class: "muted" }, text),
    actions: (close) => [
      h("button", { onclick: close }, "Cancel"),
      h(
        "button",
        {
          class: "error",
          onclick: () => {
            close();
            onConfirm();
          },
        },
        "Delete",
      ),
    ],
  });
}

// -- toggle switch ------------------------------------------------------------
export function toggleSwitch({ checked, label, onToggle }) {
  const holder = h(
    "span",
    { class: `switch ${checked ? "on" : ""}`, onclick: () => onToggle() },
    h("span", { class: "track" }, h("span", { class: "thumb" })),
    h("span", {}, label),
  );
  return holder;
}

export const spinner = () => h("div", { class: "spinner" });

// -- router (history-based, like the reference's BrowserRouter) ---------------
let routerRender = null;
export function initRouter(render) {
  routerRender = render;
  window.addEventListener("popstate", () => routerRender());
  document.addEventListener("click", (e) => {
    const a = e.target.closest("a[data-link]");
    if (a) {
      e.preventDefault();
      navigate(a.getAttribute("href"));
    }
  });
  routerRender();
}

export function navigate(path, state = null) {
  history.pushState(state, "", path);
  routerRender();
}

export function routeState() {
  return history.state || {};
}

// match '/webhooks/:id/edit' style patterns against a path
export function matchRoute(pattern, path) {
  const pp = pattern.split("/").filter(Boolean);
  const sp = path.split("/").filter(Boolean);
  if (pp.length !== sp.length) return null;
  const params = {};
  for (let i = 0; i < pp.length; i++) {
    if (pp[i].startsWith(":")) params[pp[i].slice(1)] = decodeURIComponent(sp[i]);
    else if (pp[i] !== sp[i]) return null;
  }
  return params;
}

export const fmtDate = (v) => {
  const d = new Date(v);
  return isNaN(d) ? String(v ?? "") : d.toLocaleString();
};
