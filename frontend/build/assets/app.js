// App shell - same route table as the reference's App.tsx and the same
// drawer navigation as components/Layout.tsx.

import { h, initRouter, matchRoute } from "/assets/ui.js";
import { Dashboard } from "/assets/pages/Dashboard.js";
import { WebhookList } from "/assets/pages/WebhookList.js";
import { WebhookForm } from "/assets/pages/WebhookForm.js";
import { WebhookDetail } from "/assets/pages/WebhookDetail.js";
import { ReferenceTableList } from "/assets/pages/ReferenceTableList.js";
import { ReferenceTableUpload } from "/assets/pages/ReferenceTableUpload.js";
import { UdfList } from "/assets/pages/UdfList.js";
import { UdfForm } from "/assets/pages/UdfForm.js";
import { WebhookTester } from "/assets/pages/WebhookTester.js";
import { SqlQuery } from "/assets/pages/SqlQuery.js";
import { NotFound } from "/assets/pages/NotFound.js";

const ROUTES = [
  ["/", Dashboard],
  ["/webhooks", WebhookList],
  ["/webhooks/new", WebhookForm],
  ["/webhooks/:id", WebhookDetail],
  ["/webhooks/:id/edit", WebhookForm],
  ["/reference-tables", ReferenceTableList],
  ["/reference-tables/upload", ReferenceTableUpload],
  ["/udfs", UdfList],
  ["/udfs/new", UdfForm],
  ["/udfs/:id/edit", UdfForm],
  ["/tester", WebhookTester],
  ["/query", SqlQuery],
];

const MENU = [
  ["Dashboard", "/", "▦"],
  ["Webhooks", "/webhooks", "⛓"],
  ["Reference Tables", "/reference-tables", "🗄"],
  ["User-Defined Functions", "/udfs", "ƒ"],
  ["Webhook Tester", "/tester", "🐞"],
  ["SQL Query", "/query", "❯_"],
];

function renderChrome(path) {
  const drawer = document.getElementById("drawer");
  drawer.replaceChildren(
    h("div", { class: "brand" }, "Webhook Gateway"),
    h(
      "nav",
      {},
      ...MENU.map(([text, to, icon]) =>
        h(
          "a",
          { href: to, "data-link": true, class: path === to ? "selected" : "" },
          h("span", { class: "ic" }, icon),
          h("span", {}, text),
        ),
      ),
    ),
  );
  const current = MENU.find(([, to]) => to === path);
  document.getElementById("appbar").replaceChildren(
    h("span", {}, current ? current[0] : "Webhook Gateway"),
  );
}

function render() {
  const path = location.pathname.replace(/\/+$/, "") || "/";
  renderChrome(path);
  const main = document.getElementById("main");
  main.replaceChildren();
  for (const [pattern, page] of ROUTES) {
    // static routes win over :id ones because they're listed first
    const params = matchRoute(pattern, path);
    if (params) {
      page(main, params);
      return;
    }
  }
  NotFound(main, {});
}

initRouter(render);
